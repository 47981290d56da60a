"""lorikeet_tpu — a TPU-native strain-level metagenomic variant-analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of rhysnewell/Lorikeet
(GATK-HaplotypeCaller-style local re-assembly variant calling plus strain-resolution
machinery), built TPU-first:

- Hot kernels (pair-HMM forward, Smith-Waterman scoring, band-pass activity
  convolution, genotype-likelihood math) run as batched JAX/Pallas programs.
- Ragged genomic work (regions, reads, haplotypes) is bucketed into static-shape
  batches so XLA sees only static shapes.
- Host code (BAM/FASTA/VCF I/O, graph assembly) feeds the device via padded tensors.
- Multi-chip scaling uses jax.sharding Mesh + shard_map over region batches.

Layer map mirrors the reference survey (SURVEY.md §1): utils → io → ops (kernels)
→ assembly → calling → strain → cli.
"""

__version__ = "0.1.0"

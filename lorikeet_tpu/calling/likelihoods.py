"""Read x allele likelihood machinery and the pair-HMM likelihood engine.

Contracts:
- allele_likelihoods.rs: per-sample [alleles, reads] log10 matrices;
  normalize_likelihoods caps each read's worst value at best + cap (:378-447);
  marginalize takes the max over the haplotypes backing each allele (:633);
  filter_poorly_modeled_evidence drops reads whose best likelihood is below a
  per-read threshold (:925).
- pair_hmm_likelihood_calculation_engine.rs: read quality preparation (cap
  base quals at mapq, fix quals < 18 to 6; ins/del quals default 45 adjusted
  by the conservative PCR error model on STR repeats, floors at 6; gcp 10)
  and the static disqualification threshold
  min(2, ceil(len * 0.001)) * -4.0 (:293-320).

The likelihood values themselves come from the batched TPU pair-HMM
(ops.pairhmm_pallas on device, ops.pairhmm scan on CPU), escalated through
pairhmm_forward_checked for f32-flushed deep negatives.
"""
from __future__ import annotations

import functools

import numpy as np

from lorikeet_tpu.ops.pairhmm import pairhmm_forward_checked

DEFAULT_INS_QUAL = 45
DEFAULT_DEL_QUAL = 45
DEFAULT_GCP = 10
MIN_USABLE_Q = 6
BASE_QUALITY_SCORE_THRESHOLD = 18
#: cli.rs expected-mismatch-rate-for-read-disqualification default
EXPECTED_ERROR_RATE_PER_BASE = 0.02
LOG10_QUAL_PER_BASE = -4.0

#: (mean, variance) of the per-base log-qual contribution, indexed by
#: baseQ 1..40 — the dynamic read-disqualification lookup table
#: (pair_hmm_likelihood_calculation_engine.rs:23-41).  Threshold over a
#: read = -(sum(means) + K * sqrt(sum(variances))) / 10.
_DYN_QUAL_MEAN = np.array([
    5.996842844, 5.870018422, 5.401558531, 4.818940919, 4.218758304,
    3.646319832, 3.122346753, 2.654731979, 2.244479156, 1.88893867,
    1.583645342, 1.3233807, 1.102785365, 0.916703025, 0.760361881,
    0.629457387, 0.520175654, 0.42918208, 0.353590663, 0.290923699,
    0.23906788, 0.196230431, 0.160897421, 0.131795374, 0.1078567,
    0.088189063, 0.072048567, 0.058816518, 0.047979438, 0.039111985,
    0.031862437, 0.025940415, 0.021106532, 0.017163711, 0.013949904,
    0.011332027, 0.009200898, 0.007467036, 0.006057179, 0.004911394])
_DYN_QUAL_VAR = np.array([
    0.196616587, 1.388545569, 5.641990128, 10.33176216, 14.25799688,
    17.02880749, 18.64537883, 19.27521677, 19.13584613, 18.43922003,
    17.36842261, 16.07088712, 14.65952563, 13.21718577, 11.80207947,
    10.45304833, 9.194183767, 8.038657241, 6.991779595, 6.053379213,
    5.219610436, 4.484302033, 3.839943445, 3.27839108, 2.791361596,
    2.370765375, 2.008921719, 1.698687797, 1.433525748, 1.207526336,
    1.015402928, 0.852465956, 0.714585285, 0.598145851, 0.500000349,
    0.41742159, 0.348056286, 0.289881373, 0.241163527, 0.200422214])


def dynamic_read_qual_threshold(quals: np.ndarray,
                                dynamic_read_qual_constant: float) -> float:
    """log10 disqualification threshold for one read's (prepared) base quals
    (calculate_log10_dynamic_read_qual_threshold,
    pair_hmm_likelihood_calculation_engine.rs:261-290)."""
    idx = np.clip(quals.astype(np.int64), 1, 40) - 1
    s_mean = float(_DYN_QUAL_MEAN[idx].sum())
    s_var = float(_DYN_QUAL_VAR[idx].sum())
    return (s_mean + dynamic_read_qual_constant * np.sqrt(s_var)) * -0.1
MAX_STR_UNIT_LENGTH = 20
MAX_REPEAT_LENGTH = 100
INITIAL_QSCORE = 40.0

#: --pcr-indel-model -> repeat-cap rate factor (PCRErrorModel, pair_hmm_
#: likelihood_calculation_engine.rs:61-90; the enum discriminant IS the
#: rate factor; None disables the repeat scan entirely, :173-175)
PCR_INDEL_MODELS = {"none": None, "hostile": 1.0, "aggressive": 2.0,
                    "conservative": 3.0}


@functools.lru_cache(maxsize=None)
def _pcr_error_cache(rate_factor: float = 3.0) -> np.ndarray:
    # pair_hmm_likelihood_calculation_engine.rs:169-193 (conservative = 3)
    out = np.empty(MAX_REPEAT_LENGTH + 1, np.uint8)
    for rl in range(MAX_REPEAT_LENGTH + 1):
        out[rl] = max(6, int(INITIAL_QSCORE - np.exp(rl / (rate_factor * np.pi)) + 1.0))
    out.setflags(write=False)
    return out


def _run_end(m: np.ndarray) -> np.ndarray:
    """Consecutive-True run length of m ending at each index (vectorized)."""
    n = len(m)
    if n == 0:
        return np.zeros(0, np.int64)
    idx = np.arange(n)
    last_false = np.maximum.accumulate(np.where(~m, idx, -1))
    return np.where(m, idx - last_false, 0)


def repeat_lengths_vector(bases: np.ndarray) -> np.ndarray:
    """Tandem-repeat length at every offset (native C++ when available)."""
    from lorikeet_tpu.ops.repeats_native import repeat_lengths_native
    out = repeat_lengths_native(bases, MAX_STR_UNIT_LENGTH, MAX_REPEAT_LENGTH)
    if out is None:
        out = _repeat_lengths_vector_np(bases)
    return out


def _repeat_lengths_vector_np(bases: np.ndarray) -> np.ndarray:
    """Tandem-repeat length at every offset, vectorized over positions.

    Exact semantics of find_tandem_repeat_units
    (pair_hmm_likelihood_calculation_engine.rs:528-612), derived as follows:
    with m_s[t] = (bases[t+s] == bases[t]) and r_end/r_start its run lengths,
    the backward repeat count of the size-s unit ending at offset i is
    1 + r_end_s[i-s]//s, the forward count of the unit starting at i+1 is
    1 + r_start_s[i+1]//s, units are equal iff r_end_s[i] >= s, and in the
    unequal case the backward extension of the forward unit is
    r_end_{s_fw}[i] // s_fw.  Cross-checked against the scalar version.
    """
    n = len(bases)
    out = np.zeros(n, np.int64)
    if n < 2:
        return np.minimum(np.ones(n, np.int64), MAX_REPEAT_LENGTH)
    idx = np.arange(n)
    smax = min(MAX_STR_UNIT_LENGTH, n - 1)

    r_end = {}
    r_start = {}
    for s in range(1, smax + 1):
        m = bases[s:] == bases[:-s]
        r_end[s] = _run_end(m)
        r_start[s] = _run_end(m[::-1])[::-1]

    def _gather(arr, pos):
        ok = (pos >= 0) & (pos < len(arr))
        return np.where(ok, arr[np.clip(pos, 0, max(len(arr) - 1, 0))], 0), ok

    NOT_FOUND = 0
    bw_s = np.zeros(n, np.int64)
    bw_count = np.ones(n, np.int64)
    fw_s = np.zeros(n, np.int64)
    fw_count = np.where(idx < n - 1, 1, 0).astype(np.int64)
    for s in range(1, smax + 1):
        re_, ok = _gather(r_end[s], idx - s)
        cnt = np.where(ok & (idx + 1 - s >= 0), 1 + re_ // s, 1)
        hit = (bw_s == NOT_FOUND) & (cnt > 1)
        bw_s[hit] = s
        bw_count[hit] = cnt[hit]

        rs_, okf = _gather(r_start[s], idx + 1)
        tryable = (idx + s + 1 <= n) & (idx < n - 1)
        cntf = np.where(tryable, 1 + np.where(okf, rs_, 0) // s, 0)
        hitf = (fw_s == NOT_FOUND) & tryable & (cntf > 1)
        fw_s[hitf] = s
        fw_count[hitf] = cntf[hitf]

    eff_bw_s = np.where(bw_s == NOT_FOUND, 1, bw_s)
    eff_fw_s = np.where(fw_s == NOT_FOUND, 1, fw_s)
    # units equal iff same size and r_end_s[i] >= s
    re_at_i = np.zeros(n, np.int64)
    for s in range(1, smax + 1):
        sel = eff_bw_s == s
        vals, ok = _gather(r_end[s], idx)
        re_at_i[sel] = vals[sel]
    units_equal = (eff_bw_s == eff_fw_s) & (re_at_i >= eff_bw_s) & (idx + 1 - eff_bw_s >= 0)
    # backward extension of the forward unit (unequal case)
    bw2 = np.zeros(n, np.int64)
    for s in range(1, smax + 1):
        sel = eff_fw_s == s
        vals, ok = _gather(r_end[s], idx)
        bw2[sel] = np.where((idx + 1 - s >= 0), vals // s, 0)[sel]

    has_fw = idx < n - 1
    rl = np.where(has_fw,
                  np.where(units_equal, bw_count + fw_count, fw_count + bw2),
                  bw_count)
    return np.minimum(rl, MAX_REPEAT_LENGTH)


def _repeat_length_at(bases: np.ndarray, offset: int) -> int:
    """Tandem-repeat length around offset (find_tandem_repeat_units, compact)."""
    n = len(bases)
    best_bw = 0
    bw_unit = bases[offset:offset + 1]
    for s in range(1, MAX_STR_UNIT_LENGTH + 1):
        if offset + 1 - s < 0:
            break
        unit = bases[offset + 1 - s:offset + 1]
        reps = _count_reps_backward(bases[:offset + 1], unit)
        if reps > 1:
            best_bw = reps
            bw_unit = unit
            break
        best_bw = max(best_bw, reps) if s == 1 else best_bw
    max_rl = best_bw
    if offset < n - 1:
        fw_unit = bases[offset + 1:offset + 2]
        max_fw = 0
        for s in range(1, MAX_STR_UNIT_LENGTH + 1):
            if offset + s + 1 > n:
                break
            unit = bases[offset + 1:offset + 1 + s]
            reps = _count_reps_forward(bases[offset + 1:], unit)
            if reps > 1:
                max_fw = reps
                fw_unit = unit
                break
            if s == 1:
                max_fw = reps
        if fw_unit.tobytes() == bw_unit.tobytes():
            max_rl = best_bw + max_fw
        else:
            bw2 = _count_reps_backward(bases[:offset + 1], fw_unit)
            max_rl = max_fw + bw2
    return min(max_rl, MAX_REPEAT_LENGTH)


def _count_reps_forward(seq: np.ndarray, unit: np.ndarray) -> int:
    s = len(unit)
    reps = 0
    pos = 0
    while pos + s <= len(seq) and np.array_equal(seq[pos:pos + s], unit):
        reps += 1
        pos += s
    return reps


def _count_reps_backward(seq: np.ndarray, unit: np.ndarray) -> int:
    s = len(unit)
    reps = 0
    pos = len(seq)
    while pos - s >= 0 and np.array_equal(seq[pos - s:pos], unit):
        reps += 1
        pos -= s
    return reps


def prepare_read_for_hmm(rec, disable_cap_to_mapq: bool = False,
                         pcr_rate_factor: float = 3.0,
                         gcp_value: int = DEFAULT_GCP,
                         base_quality_score_threshold: int =
                         BASE_QUALITY_SCORE_THRESHOLD):
    """(bases, quals, ins_quals, del_quals, gcps) after engine preparation.

    Also stashes the prepared base quals on the record as ``hmm_quals``
    (the HMMQuals transient attribute the reference keeps for dynamic read
    disqualification, pair_hmm_likelihood_calculation_engine.rs:268-272)."""
    bases = rec.seq
    quals = rec.qual.astype(np.int64)
    if not disable_cap_to_mapq:
        quals = np.minimum(quals, rec.mapq)
    quals = np.where(quals < base_quality_score_threshold, MIN_USABLE_Q, quals)
    n = len(bases)
    iq = np.full(n, DEFAULT_INS_QUAL, np.int64)
    dq = np.full(n, DEFAULT_DEL_QUAL, np.int64)
    cache = _pcr_error_cache(pcr_rate_factor) \
        if pcr_rate_factor is not None else None
    # PCR error model: cap indel quals by repeat content (vectorized;
    # apply_pcr_error_model caps position i-1 by the repeat length at i-1)
    if cache is not None and n > 1:
        rls = repeat_lengths_vector(bases)[:n - 1]
        caps = cache[rls].astype(np.int64)
        iq[:n - 1] = np.minimum(iq[:n - 1], caps)
        dq[:n - 1] = np.minimum(dq[:n - 1], caps)
    iq = np.where(iq < MIN_USABLE_Q, MIN_USABLE_Q, iq)
    dq = np.where(dq < MIN_USABLE_Q, MIN_USABLE_Q, dq)
    gcp = np.full(n, gcp_value, np.uint8)
    quals = quals.astype(np.uint8)
    rec.hmm_quals = quals
    return (bases, quals, iq.astype(np.uint8), dq.astype(np.uint8), gcp)


def prepare_reads_for_hmm_batch(recs: list, disable_cap_to_mapq: bool = False,
                                pcr_rate_factor: float = 3.0,
                                gcp_value: int = DEFAULT_GCP,
                                base_quality_score_threshold: int =
                                BASE_QUALITY_SCORE_THRESHOLD) -> list:
    """Batched prepare_read_for_hmm over a whole region's reads: one
    concatenated qual/STR pass and one native repeats crossing instead of
    per-read numpy + ctypes calls.  Identical outputs (conformance-tested)."""
    if not recs:
        return []
    n_reads = len(recs)
    lens = np.fromiter((len(r.seq) for r in recs), np.int64, n_reads)
    offs = np.zeros(n_reads + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    total = int(offs[-1])
    quals = np.concatenate([r.qual for r in recs]).astype(np.int64) \
        if total else np.zeros(0, np.int64)
    if not disable_cap_to_mapq:
        mapqs = np.repeat(
            np.fromiter((r.mapq for r in recs), np.int64, n_reads), lens)
        quals = np.minimum(quals, mapqs)
    quals = np.where(quals < base_quality_score_threshold, MIN_USABLE_Q,
                     quals)
    iq = np.full(total, DEFAULT_INS_QUAL, np.int64)
    dq = np.full(total, DEFAULT_DEL_QUAL, np.int64)
    cache = _pcr_error_cache(pcr_rate_factor) \
        if pcr_rate_factor is not None else None
    if cache is not None and total:
        from lorikeet_tpu.ops.repeats_native import repeat_lengths_batch_native
        concat = np.concatenate([r.seq for r in recs])
        rls = repeat_lengths_batch_native(
            concat, offs, MAX_STR_UNIT_LENGTH, MAX_REPEAT_LENGTH)
        if rls is None:
            rls = np.concatenate(
                [_repeat_lengths_vector_np(r.seq) for r in recs])
        caps = cache[rls].astype(np.int64)
        # per read, position i-1 is capped by the repeat length at i-1 and
        # the final offset is exempt (apply_pcr_error_model semantics)
        notlast = np.ones(total, bool)
        notlast[offs[1:] - 1] = False
        iq = np.where(notlast, np.minimum(iq, caps), iq)
        dq = np.where(notlast, np.minimum(dq, caps), dq)
    iq = np.maximum(iq, MIN_USABLE_Q).astype(np.uint8)
    dq = np.maximum(dq, MIN_USABLE_Q).astype(np.uint8)
    quals = np.maximum(quals, 0).astype(np.uint8)
    gcp = np.full(total, gcp_value, np.uint8)
    out = []
    for k, rec in enumerate(recs):
        lo, hi = int(offs[k]), int(offs[k + 1])
        q = quals[lo:hi]
        rec.hmm_quals = q
        out.append((rec.seq, q, iq[lo:hi], dq[lo:hi], gcp[lo:hi]))
    return out


class AlleleLikelihoods:
    """Per-sample log10 likelihood matrices over (alleles x reads)."""

    def __init__(self, alleles: list, reads_by_sample: dict):
        self.alleles = list(alleles)
        self.reads_by_sample = {s: list(v) for s, v in reads_by_sample.items()}
        self.values = {s: np.zeros((len(self.alleles), len(v)))
                       for s, v in self.reads_by_sample.items()}
        self.filtered_reads = {s: [] for s in self.reads_by_sample}

    @property
    def samples(self):
        return sorted(self.reads_by_sample)

    def normalize_likelihoods(self, cap: float, symmetric: bool = True):
        """Cap each read's worst likelihood at best + cap
        (allele_likelihoods.rs:378-447).  ``cap = -inf`` disables.  With
        ``symmetric`` the best may be the reference allele; otherwise only
        alt alleles compete (disable-symmetric-hmm-normalizing)."""
        if cap == -np.inf:
            return
        for s, mat in self.values.items():
            if mat.shape[0] <= 1 or mat.shape[1] == 0:
                continue
            if symmetric:
                best = mat.max(axis=0)
            else:
                non_ref = [i for i, a in enumerate(self.alleles)
                           if not getattr(a, "is_ref", False)]
                best = mat[non_ref].max(axis=0) if non_ref else mat.max(axis=0)
            floor = best + cap
            np.maximum(mat, floor[None, :], out=mat)

    def filter_poorly_modeled_evidence(
            self, dynamic: bool = True,
            dynamic_read_qual_constant: float = 1.0,
            expected_error_rate: float = EXPECTED_ERROR_RATE_PER_BASE):
        """Drop reads whose best likelihood falls below the disqualification
        threshold (allele_likelihoods.rs:925 +
        pair_hmm_likelihood_calculation_engine.rs:226-320).

        Static (``dynamic=False``): min(2, ceil(len*rate)) * -4.
        Dynamic (reference default): min(lookup-table threshold over the
        prepared HMM quals, ceil(len*rate) * -4) — uncapped static arm.
        """
        for s in list(self.reads_by_sample):
            reads = self.reads_by_sample[s]
            mat = self.values[s]
            if not reads:
                continue
            if dynamic:
                lens = np.fromiter((len(r) for r in reads), np.int64,
                                   len(reads))
                static = np.ceil(lens * expected_error_rate) \
                    * LOG10_QUAL_PER_BASE
                # batched dynamic threshold: one concatenated table lookup
                # + segment sums instead of a per-read python round trip
                # (identical to dynamic_read_qual_threshold per read)
                qs = [np.asarray(getattr(r, "hmm_quals", r.qual))
                      for r in reads]
                qlens = np.fromiter((len(q) for q in qs), np.int64, len(qs))
                offs = np.zeros(len(qs) + 1, np.int64)
                np.cumsum(qlens, out=offs[1:])
                if int(offs[-1]):
                    idx = np.clip(np.concatenate(qs).astype(np.int64),
                                  1, 40) - 1
                    # clamp segment starts into range (a trailing empty
                    # read would index past the buffer); empty segments
                    # are zeroed below either way
                    seg = np.minimum(offs[:-1], int(offs[-1]) - 1)
                    s_mean = np.add.reduceat(_DYN_QUAL_MEAN[idx], seg)
                    s_var = np.add.reduceat(_DYN_QUAL_VAR[idx], seg)
                    # reduceat wraps on empty segments; zero them explicitly
                    empty = qlens == 0
                    s_mean[empty] = 0.0
                    s_var[empty] = 0.0
                else:
                    s_mean = np.zeros(len(qs))
                    s_var = np.zeros(len(qs))
                dyn = (s_mean + dynamic_read_qual_constant
                       * np.sqrt(s_var)) * -0.1
                thresholds = np.minimum(static, dyn)
            else:
                thresholds = np.array([
                    min(2.0, np.ceil(len(r) * expected_error_rate))
                    * LOG10_QUAL_PER_BASE for r in reads])
            keep = mat.max(axis=0) >= thresholds
            self.filtered_reads[s] = [r for r, k in zip(reads, keep) if not k]
            self.reads_by_sample[s] = [r for r, k in zip(reads, keep) if k]
            self.values[s] = mat[:, keep]

    def marginalize(self, allele_mapper: dict) -> "AlleleLikelihoods":
        """Haplotype likelihoods -> allele likelihoods via per-read max over
        each allele's haplotypes (allele_likelihoods.rs:633)."""
        new_alleles = list(allele_mapper.keys())
        out = AlleleLikelihoods(new_alleles, self.reads_by_sample)
        for s, mat in self.values.items():
            new_mat = np.full((len(new_alleles), mat.shape[1]), -np.inf)
            for ai, allele in enumerate(new_alleles):
                hap_idx = allele_mapper[allele]
                if hap_idx:
                    new_mat[ai] = mat[hap_idx, :].max(axis=0)
            out.values[s] = new_mat
        return out

    def retain_evidence(self, predicate):
        """Keep only reads passing predicate (overlap window etc.)."""
        for s in list(self.reads_by_sample):
            reads = self.reads_by_sample[s]
            keep = np.array([predicate(r) for r in reads], bool) \
                if reads else np.zeros(0, bool)
            self.reads_by_sample[s] = [r for r, k in zip(reads, keep) if k]
            self.values[s] = self.values[s][:, keep]

    def retain_evidence_masks(self, masks: dict):
        """retain_evidence with a precomputed boolean mask per sample —
        the per-event overlap window reduces to two numpy compares when
        the caller holds pos/end arrays (engine.genotype_region does)."""
        for s in list(self.reads_by_sample):
            reads = self.reads_by_sample[s]
            keep = masks[s]
            if keep.all():
                continue
            self.reads_by_sample[s] = [r for r, k in zip(reads, keep) if k]
            self.values[s] = self.values[s][:, keep]

    def best_allele_per_read(self, sample):
        mat = self.values[sample]
        if mat.size == 0:
            return np.zeros(0, np.int64)
        return mat.argmax(axis=0)


#: "ties" = best within this log10 margin of the runner-up
#: (allele_likelihoods.rs:17 LOG_10_INFORMATIVE_THRESHOLD)
LOG10_INFORMATIVE_THRESHOLD = 0.2


def search_best_alleles(mat: np.ndarray, priorities=None,
                        threshold: float = LOG10_INFORMATIVE_THRESHOLD):
    """Per-read (best_index, likelihood, confidence) for an [A, R] matrix
    with the reference's near-tie priority break
    (allele_likelihoods.rs:457-553 search_best_allele + :1043
    best_alleles_tie_breaking): the likelihood-best allele wins outright
    unless the runner-up is within ``threshold``, in which case the
    highest-``priorities`` allele among ALL candidates within threshold of
    the best takes over (equal priority keeps the likelihood-best; the
    displaced best becomes the runner-up, so an override's confidence goes
    negative).  Reference priority (ref=1, alt=0) reproduces GATK's
    reference-tie preference in AD/BQ; realignment uses
    ref_term + (1 - cigar_elements) (assembly_based_caller_utils.rs:187)."""
    n_alleles, n_reads = mat.shape
    if n_alleles == 0 or n_reads == 0:
        return (np.zeros(n_reads, np.int64), np.full(n_reads, -np.inf),
                np.zeros(n_reads))
    best = mat.argmax(axis=0)                     # first max wins
    best_lk = mat[best, np.arange(n_reads)]
    if n_alleles == 1:
        # runner-up is -inf -> confidence +inf (BestAllele::new semantics)
        return best, best_lk, np.full(n_reads, np.inf)
    masked = mat.copy()
    masked[best, np.arange(n_reads)] = -np.inf
    second = masked.argmax(axis=0)
    second_lk = masked[second, np.arange(n_reads)]
    confidence = np.where(np.abs(best_lk - second_lk) < 2.3e-16, 0.0,
                          best_lk - second_lk)
    if priorities is not None:
        pri = np.asarray(priorities)
        for r in np.flatnonzero(best_lk - second_lk < threshold).tolist():
            # faithful scalar replay of the reference's re-break loop
            b, s = int(best[r]), int(second[r])
            bp, sp = pri[b], pri[s]
            for a in range(n_alleles):
                if a == b or (best_lk[r] - mat[a, r]) > threshold:
                    continue
                if pri[a] > bp:
                    s, b = b, a
                    sp, bp = bp, pri[a]
                elif pri[a] > sp:
                    s, sp = a, pri[a]
            best[r] = b
            lk = mat[b, r]
            slk = mat[s, r] if s != b else -np.inf
            best_lk[r] = lk
            confidence[r] = 0.0 if abs(lk - slk) < 2.3e-16 else lk - slk
    return best, best_lk, confidence


def build_pairs(haplotypes: list, reads_by_sample: dict,
                pcr_rate_factor: float = 3.0,
                gcp_value: int = DEFAULT_GCP,
                base_quality_score_threshold: int =
                BASE_QUALITY_SCORE_THRESHOLD,
                disable_cap_to_mapq: bool = False):
    """Prepared (hap, read...) operand tuples + (sample, allele, read)
    index for every pair."""
    hap_arrays = [np.frombuffer(h.bases, np.uint8) for h in haplotypes]
    pairs = []
    index = []  # (sample, allele_idx, read_idx)
    for s in sorted(reads_by_sample):
        prepped = prepare_reads_for_hmm_batch(
            reads_by_sample[s], pcr_rate_factor=pcr_rate_factor,
            gcp_value=gcp_value,
            base_quality_score_threshold=base_quality_score_threshold,
            disable_cap_to_mapq=disable_cap_to_mapq)
        for r_idx, (bases, q, iq, dq, gcp) in enumerate(prepped):
            for a_idx, hap in enumerate(hap_arrays):
                pairs.append((hap, bases, q, iq, dq, gcp))
                index.append((s, a_idx, r_idx))
    return pairs, index


#: Pallas kernel shape buckets already compiled in this process.
#:
#: Persistent-compile-cache finding (round 3, measured on the axon tunnel,
#: jax 0.9.0): the JAX_COMPILATION_CACHE_DIR env var is silently IGNORED by
#: this jax version (config default is None; only jax.config.update sets it),
#: so the cache was never on.  Enabling it explicitly makes things WORSE on
#: the tunneled backend: executable serialization adds ~26 s per compile and
#: a disk HIT deserializes in ~333 s vs a 7.7 s fresh compile (measured,
#: docs/benchmarks.md).  Policy: no persistent cache here — instead the
#: bucket set is prewarmed EAGERLY in background threads from pipeline start
#: (prewarm_pallas_buckets), and every batch routes to the device as soon as
#: its bucket is warm; cold buckets run on the exact f64 host kernel while
#: their compile proceeds in the background.
_PALLAS_WARM_BUCKETS: set = set()
_PALLAS_FAILED_BUCKETS: set = set()
#: batches dispatched to the device vs host fallback this process (the
#: engagement counter bench_e2e reports — a silent device bypass must be
#: visible in the stage split, not inferred from timings).  "remote" counts
#: batches a pool WORKER shipped to the parent's device service.
DISPATCH_COUNTS = {"device": 0, "host": 0, "remote": 0}

def _join_prewarm_threads():
    """Killing a daemon thread mid-XLA-compile at interpreter exit aborts
    the process ("FATAL: exception not rethrown"); waiting also finishes
    populating the persistent compile cache for the next run."""
    import time as _time
    # shared deadline generous enough for a legitimate cold compile
    # (minutes at large block sizes); a wedged compiler still cannot hang
    # exit forever, and N threads share one budget
    deadline = _time.time() + 600
    for t in list(_prewarm_threads.values()):
        t.join(timeout=max(0.0, deadline - _time.time()))


import atexit as _atexit
_atexit.register(_join_prewarm_threads)
_prewarm_threads: dict = {}


def lane_fit_bucket(rmax: int) -> int:
    """Read-length bucket: next 32k-1 value >= rmax.  The kernel's lane axis
    holds the boundary row + read positions (Rmax+1 lanes), so buckets one
    short of a sublane multiple keep Rpad = roundup(Rmax+1, 128) from
    spilling to the next 128 multiple: a 100 bp read lands at Rpad=128
    (79% lane use) instead of 256 (39%)."""
    return -(-(rmax + 1) // 32) * 32 - 1


_prewarm_queue: list = []
_prewarm_lock = None


def _prewarm_worker():
    """Single background compile worker: drains the bucket queue one compile
    at a time.  Concurrent compile RPCs over the tunneled backend can wedge
    the remote agent (observed round 3: 4 parallel Mosaic compiles + a
    main-thread lowering left the device queue stuck for >10 min), so all
    prewarm compiles serialize through this one thread."""
    while True:
        with _prewarm_lock:
            if not _prewarm_queue:
                _prewarm_threads.pop("worker", None)
                return
            bucket = _prewarm_queue.pop(0)
        _prewarm_bucket(bucket)


def prewarm_pallas_buckets(buckets=None) -> None:
    """Queue background Mosaic compiles for `buckets` (default: the
    short-read production set) so the device path is warm by the time the
    first big region batch arrives.  Safe to call multiple times; no-op per
    bucket once a compile is queued or landed.  Compiles run strictly one at
    a time on a single worker thread (see _prewarm_worker)."""
    import threading
    global _prewarm_lock
    if _prewarm_lock is None:
        _prewarm_lock = threading.Lock()
    if buckets is None:
        # short reads <=127bp (Rpad=128) against haplotypes up to ~650bp:
        # even-rounded nchunks 4/6/2 covers every trimmed region the
        # default max-assembly-region-size/padding can produce, most
        # common first (cold compiles are slow and serialized, so order
        # decides which production batches engage the device earliest)
        buckets = [(128, 4), (128, 6), (128, 2)]
    with _prewarm_lock:
        for bucket in buckets:
            if bucket in _PALLAS_WARM_BUCKETS or bucket in _prewarm_queue \
                    or bucket in _prewarm_threads \
                    or bucket in _PALLAS_FAILED_BUCKETS:
                continue
            _prewarm_queue.append(bucket)
        if _prewarm_queue and "worker" not in _prewarm_threads:
            t = threading.Thread(target=_prewarm_worker, daemon=True)
            _prewarm_threads["worker"] = t
            t.start()


def _prewarm_bucket(bucket: tuple) -> None:
    """Compile the kernel for `bucket` on a dummy slab (runs in a background
    thread): batches keep flowing through the host path until the compile
    lands, so the cold-compile latency is hidden behind host work."""
    Rpad, nchunks = bucket
    try:
        import jax
        if jax.default_backend() == "cpu":
            return  # no Mosaic target to warm (CPU lowering is pathological)
        from lorikeet_tpu.ops.pairhmm_pallas import (
            NBLOCKS_STEP, ROWS_STEP, pairhmm_forward_grouped,
        )
        # dummy pairs hitting this (Rpad, nchunks) bucket in BOTH dispatch
        # variants (small tail and full slab) of the grouped path
        R = Rpad - 1
        H = max(1, (nchunks - 1) * 128)
        hap = np.full(H, ord("A"), np.uint8)
        read = np.full(R, ord("A"), np.uint8)
        z = np.full(R, 30, np.uint8)
        # wire=True matches the pool workers' forced-wire jobs (the
        # direct path's auto gate picks the same variant on tunnel-class
        # links; a flat-variant miss on a fast link compiles inline there)
        np.asarray(pairhmm_forward_grouped([(hap, read, z, z, z, z)],
                                           wire=True))
        # full variant: ROWS_STEP+64 DISTINCT reads x 8 haps exceeds both
        # small steps (rows > ROWS_STEP, blocks > NBLOCKS_STEP) without
        # nearing the caps
        haps = [np.full(H, ord("A"), np.uint8) for _ in range(8)]
        reads = [np.full(R, ord("A"), np.uint8)
                 for _ in range(ROWS_STEP + 64)]
        big = [(h, r, z, z, z, z) for r in reads for h in haps]
        np.asarray(pairhmm_forward_grouped(big, wire=True))
        # seed the cost model from a measured WARM dispatch so no
        # production batch ever routes to the device just to learn the
        # link rate (a learning batch costs whatever the link costs)
        import time as _time
        t0 = _time.perf_counter()
        np.asarray(pairhmm_forward_grouped(big))
        cells, bytes_est, n_disp = _batch_cost_inputs(big)
        _update_perf("dev_bps", bytes_est,
                     max(1e-6, _time.perf_counter() - t0
                         - n_disp * _PERF["dev_lat"]))
        _PALLAS_WARM_BUCKETS.add(bucket)
    except Exception:               # noqa: BLE001 — prewarm is best-effort
        # a failed bucket must NOT be retried every batch (an earlier bug
        # re-queued a crashing prewarm indefinitely: constant GIL churn
        # and the device never engaged) — log once and blacklist
        import logging
        logging.getLogger(__name__).warning(
            "pallas prewarm failed for bucket %s", bucket, exc_info=True)
        _PALLAS_FAILED_BUCKETS.add(bucket)
    finally:
        _prewarm_threads.pop(bucket, None)


def _pallas_bucket(pairs) -> tuple:
    """(Rpad, nchunks) compile-shape bucket the kernel wrapper would use
    (nchunks rounds to even — see ops.pairhmm_pallas.pack_grouped_inputs)."""
    Rmax = lane_fit_bucket(max(len(p[1]) for p in pairs))
    Hmax = -(-max(len(p[0]) for p in pairs) // 128) * 128
    Rpad = -(-(Rmax + 1) // 128) * 128
    nchunks = max(1, -(-(Rmax + Hmax) // 128))
    return Rpad, nchunks + (nchunks & 1)


#: force interpret-mode Pallas (CPU testing of the mesh path); set before
#: first use or monkeypatch the module attribute
import os as _os
PALLAS_INTERPRET = _os.environ.get("LORIKEET_PALLAS_INTERPRET", "") == "1"

#: Adaptive device-vs-host cost model.  Whether the device wins a batch
#: depends on the host's native throughput (cells/s) vs the link's
#: effective bandwidth+latency (the tunneled chip moves ~45-80 MB/s H2D,
#: a PCIe-attached chip ~16 GB/s — a 300x swing no static policy can
#: cover).  Both sides are ESTIMATED from observed executions (EWMA) and
#: every 16th eligible batch explores the currently-losing side to keep
#: the estimates fresh.  LORIKEET_PALLAS_ROUTE=device|host|auto overrides.
_PERF = {"host_cps": None, "dev_bps": None, "dev_lat": 0.06, "n_batch": 0,
         "rem_bps": None, "rem_lat": 0.01}
_ROUTE_MODE = _os.environ.get("LORIKEET_PALLAS_ROUTE", "auto")
_EXPLORE_EVERY = 16


def _batch_cost_inputs(pairs):
    """(true_cells, est_device_bytes, est_dispatches) for a pair batch."""
    cells = sum(len(p[0]) * len(p[1]) for p in pairs)
    uniq_reads = {id(p[1]) for p in pairs}
    uniq_haps = {id(p[0]) for p in pairs}
    rmax = max(len(p[1]) for p in pairs)
    hmax = max(len(p[0]) for p in pairs)
    rpad = -(-(lane_fit_bucket(rmax) + 1) // 128) * 128
    spad = -(-(rmax + hmax) // 128) * 128
    bytes_est = len(uniq_reads) * (5 * rpad + 32) + len(uniq_haps) * spad
    from lorikeet_tpu.ops.pairhmm_pallas import ROWS_CAP
    n_disp = max(1, -(-len(uniq_reads) // ROWS_CAP))
    return cells, bytes_est, n_disp


def _route_remote(pairs) -> bool:
    """Pool-worker routing (parallel.pool._worker_main): ship this batch
    to the parent's device service or run the local host kernel on a
    (contended) worker core.  Same measured-EWMA + exploration scheme as
    _route_device, but the remote rate is learned from the WAIT time the
    worker actually spends blocked on the reply — with the async span
    pipeline a fully-overlapped device batch costs ~0 and remote wins; a
    saturated service shows up as long waits and pushes batches local."""
    mode = _os.environ.get("LORIKEET_REMOTE_ROUTE", "auto")
    if mode == "remote":
        return True
    if mode == "local":
        return False
    _PERF["n_batch"] += 1
    cells, bytes_est, _ = _batch_cost_inputs(pairs)
    host_cps, rem_bps = _PERF["host_cps"], _PERF["rem_bps"]
    if host_cps is None or rem_bps is None:
        # LOCAL-first: the host kernel is the known-safe side (batch 1
        # always learns host_cps); the remote link gets its measurement on
        # the worker's SECOND eligible batch.  Waiting for the old
        # every-16th exploration turn meant short runs (a 1 Mbp contig is
        # ~2 span batches per worker) never measured the link at all and
        # the chip sat idle through the whole race; with the columnar RPC
        # + wire compression the learning batch costs little even when the
        # verdict lands "local".
        return host_cps is not None and rem_bps is None \
            and _PERF["n_batch"] >= 2
    t_host = cells / host_cps
    t_rem = bytes_est / rem_bps + _PERF["rem_lat"]
    pick = t_rem < t_host
    if _PERF["n_batch"] % _EXPLORE_EVERY == 0:
        pick = not pick
    elif not pick and _PERF.get("rem_bps_n", 0) < 3:
        # the first remote sample is routinely poisoned by startup
        # congestion (cold service, depth probe, every worker exploring at
        # once); keep sampling the link until the EWMA has >= 3 samples
        # before trusting a "local" verdict
        pick = True
    if _os.environ.get("LORIKEET_ROUTE_DEBUG"):
        import sys as _sys
        print(f"ROUTE n={_PERF['n_batch']} cells={cells/1e6:.0f}M "
              f"t_host={t_host*1e3:.0f}ms t_rem={t_rem*1e3:.0f}ms "
              f"host_cps={host_cps/1e9:.2f}G rem_bps={rem_bps/1e6:.0f}M "
              f"-> {'remote' if pick else 'local'}",
              file=_sys.stderr, flush=True)
    return pick


def _route_device(pairs) -> bool:
    """True when the cost model (or an exploration turn) picks the device."""
    if _ROUTE_MODE == "device":
        return True
    if _ROUTE_MODE == "host":
        return False
    _PERF["n_batch"] += 1
    cells, bytes_est, n_disp = _batch_cost_inputs(pairs)
    host_cps, dev_bps = _PERF["host_cps"], _PERF["dev_bps"]
    if host_cps is None or dev_bps is None:
        # no data yet for one side: run it to learn (host first — it is
        # never catastrophic; the device side learns on the next batch)
        return host_cps is not None
    t_host = cells / host_cps
    t_dev = bytes_est / dev_bps + n_disp * _PERF["dev_lat"]
    pick_dev = t_dev < t_host
    if _PERF["n_batch"] % _EXPLORE_EVERY == 0:
        pick_dev = not pick_dev          # exploration turn
    return pick_dev


def _update_perf(key_rate, amount, elapsed):
    if elapsed <= 1e-6:
        return
    rate = amount / elapsed
    old = _PERF[key_rate]
    _PERF[key_rate] = rate if old is None else 0.7 * old + 0.3 * rate
    _PERF[key_rate + "_n"] = _PERF.get(key_rate + "_n", 0) + 1


def compute_pair_likelihoods(pairs: list, use_pallas: bool = None) -> np.ndarray:
    """log10 likelihood per packed pair — ONE device dispatch for the whole
    batch (cross-region batching rides this).  When a device mesh is active
    (parallel.sharding.configure_mesh / --devices), the batch axis shards
    over it: each chip sweeps B_SLAB/n rows per slab."""
    if not pairs:
        return np.zeros(0)
    if use_pallas is None:
        import jax
        use_pallas = jax.default_backend() not in ("cpu",)
    interpret = PALLAS_INTERPRET
    if use_pallas and not interpret:
        bucket = _pallas_bucket(pairs)
        if bucket not in _PALLAS_WARM_BUCKETS:
            # cold bucket: start its compile NOW in the background and run
            # this batch on the host kernel; the device takes over the
            # moment the compile lands (eager-prewarm policy — see the
            # _PALLAS_WARM_BUCKETS note on why there is no disk cache)
            prewarm_pallas_buckets([bucket])
            use_pallas = False
        else:
            # warm bucket: the adaptive cost model picks the cheaper side
            use_pallas = _route_device(pairs)
    DISPATCH_COUNTS["device" if use_pallas else "host"] += 1
    import time as _time
    t0 = _time.perf_counter()
    if use_pallas:
        from lorikeet_tpu.parallel.sharding import get_mesh
        mesh = get_mesh()
        sharded = mesh is not None and mesh.devices.size > 1
        # grouped (read-tile x hap) dispatch ships each read and haplotype
        # ONCE (~10x fewer H2D bytes than the flat cross-product layout).
        # Under a mesh, whole dispatches round-robin across the chips and
        # run concurrently — no collectives, the reference's rayon region
        # fan-out (assembly_region_walker.rs:139-141) at chip granularity.
        from lorikeet_tpu.ops.pairhmm_pallas import pairhmm_forward_grouped
        devices = list(mesh.devices.flat) if sharded else None
        raw = pairhmm_forward_grouped(pairs, interpret=interpret,
                                      devices=devices)
        lks = pairhmm_forward_checked(raw, pairs)
        if not interpret:
            _, bytes_est, n_disp = _batch_cost_inputs(pairs)
            elapsed = _time.perf_counter() - t0
            # subtract the latency share, but never let a faster-than-
            # latency measurement explode the rate estimate (a tiny batch
            # finishing "instantly" would otherwise flip routing)
            transfer_s = max(elapsed - n_disp * _PERF["dev_lat"],
                             elapsed * 0.25)
            _update_perf("dev_bps", bytes_est, transfer_s)
    else:
        # exact f64 host kernel: beats device compile amortization for small
        # batches (and is the CPU-backend path outright).  Native C++
        # (threaded) when the toolchain is present, numpy otherwise.
        from lorikeet_tpu.ops.pairhmm_native import pairhmm_forward_native_batch
        lks = pairhmm_forward_native_batch(pairs)
        if lks is None:
            from lorikeet_tpu.ops.pairhmm import pairhmm_forward_np
            lks = np.array([pairhmm_forward_np(*p) for p in pairs])
        cells = sum(len(p[0]) * len(p[1]) for p in pairs)
        _update_perf("host_cps", cells, _time.perf_counter() - t0)
    return lks


def assemble_likelihoods(haplotypes: list, reads_by_sample: dict,
                         lks: np.ndarray, index: list,
                         mismapping_cap: float = -4.5,
                         symmetric: bool = True,
                         dynamic_disqualification: bool = True,
                         dynamic_read_qual_constant: float = 1.0,
                         expected_error_rate: float =
                         EXPECTED_ERROR_RATE_PER_BASE) -> AlleleLikelihoods:
    """Scatter computed pair likelihoods into the per-sample matrices and
    apply normalization (cap = log10 error prob of the phred global read
    mismapping rate, default 45 -> -4.5) + read disqualification."""
    result = AlleleLikelihoods(haplotypes, reads_by_sample)
    for (s, a_idx, r_idx), lk in zip(index, lks):
        result.values[s][a_idx, r_idx] = lk
    result.normalize_likelihoods(mismapping_cap, symmetric)
    result.filter_poorly_modeled_evidence(
        dynamic_disqualification, dynamic_read_qual_constant,
        expected_error_rate)
    return result


def compute_read_likelihoods(haplotypes: list, reads_by_sample: dict,
                             use_pallas: bool = None) -> AlleleLikelihoods:
    """Pair-HMM likelihoods for every (read, haplotype) pair, batched on
    device, with engine-level quality preparation, normalization (cap
    -45/10) and static read disqualification."""
    pairs, index = build_pairs(haplotypes, reads_by_sample)
    if not pairs:
        return AlleleLikelihoods(haplotypes, reads_by_sample)
    lks = compute_pair_likelihoods(pairs, use_pallas)
    return assemble_likelihoods(haplotypes, reads_by_sample, lks, index)

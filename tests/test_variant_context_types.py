"""VariantContext construction + type-determination vectors ported from
/root/reference/tests/variant_context_unit_tests.rs (test_determine_types
:109-214, test_multiple_snp_allele_ordering :215-246,
test_creating_snp_variant_context :247-264, test_genotype_tag_calc
:265-300 via the canonical genotype ordering)."""
import numpy as np

from lorikeet_tpu.models.genotype_alleles import genotype_count_matrix
from lorikeet_tpu.models.variants import Allele, VariantContext


def _vc(start, stop, alleles):
    return VariantContext(0, start, stop, list(alleles), [])


def A(bases, ref=False):
    return Allele(bases.encode() if isinstance(bases, str) else bases, ref)


def test_determine_types():
    T_ref, Tb = A("T", True), A("T")
    A_ref, Ab = A("A", True), A("A")
    C = A("C")
    ATC_ref, ATC = A("ATC", True), A("ATC")
    AC_ref, AC = A("AC", True), A("AC")
    AT = A("AT")
    CAT = A("CAT")
    TA_ref, TA = A("TA", True), A("TA")
    TC = A("TC")
    sym = A("<FOO>")
    s = 10

    assert _vc(s, s, [T_ref]).variant_type() == "NO_VARIATION"
    assert _vc(s, s, [T_ref, Ab]).variant_type() == "SNP"
    assert _vc(s, s, [T_ref, Ab, C]).variant_type() == "SNP"
    assert _vc(s, s + 1, [AC_ref, TA]).variant_type() == "MNP"
    assert _vc(s, s + 2, [ATC_ref, CAT, A("GGG")]).variant_type() == "MNP"
    assert _vc(s, s, [A_ref, ATC]).variant_type() == "INDEL"
    assert _vc(s, s + 2, [ATC_ref, Ab]).variant_type() == "INDEL"
    assert _vc(s, s, [T_ref, TA, TC]).variant_type() == "INDEL"
    assert _vc(s, s + 2, [ATC_ref, Ab, AC]).variant_type() == "INDEL"
    assert _vc(s, s + 2, [ATC_ref, Ab, A("ATCTC")]).variant_type() == "INDEL"
    assert _vc(s, s + 1, [TA_ref, Tb, TC]).variant_type() == "MIXED"
    assert _vc(s, s + 1, [TA_ref, Tb, AC]).variant_type() == "MIXED"
    assert _vc(s, s + 1, [AC_ref, ATC, AT]).variant_type() == "MIXED"
    assert _vc(s, s, [A_ref, Tb, sym]).variant_type() == "MIXED"
    assert _vc(s, s, [T_ref, sym]).variant_type() == "SYMBOLIC"


def test_multiple_snp_allele_ordering():
    """Allele order is preserved exactly as given (no canonical resort)."""
    A_ref, C, T = A("A", True), A("C"), A("T")
    natural = [A_ref, C, T]
    unnatural = [A_ref, T, C]
    assert _vc(10, 10, natural).alleles == natural
    assert _vc(10, 10, unnatural).alleles == unnatural


def test_creating_snp_variant_context():
    A_ref, T = A("A", True), A("T")
    vc = _vc(10, 10, [A_ref, T])
    assert vc.tid == 0
    assert vc.start == 10 and vc.end == 10
    assert vc.variant_type() == "SNP"
    assert vc.reference == A_ref
    assert vc.n_alleles == 2
    assert len(vc.alternate_alleles) == 1
    assert vc.alternate_alleles[0] == T


def test_genotype_tag_from_min_pl_index():
    """The reference's calculate_genotype_tag maps the min-PL genotype
    index to GT alleles via the canonical (ploidy, n_alleles) ordering —
    equivalent to reading the allele-count row of the genotype matrix."""
    counts = genotype_count_matrix(2, 2)   # 0/0, 0/1, 1/1

    def tag(pls):
        idx = int(np.argmin(pls))
        row = counts[idx]
        out = []
        for allele, c in enumerate(row):
            out += [allele] * int(c)
        return out

    assert tag([0, 1, 2]) == [0, 0]
    assert tag([1, 0, 2]) == [0, 1]
    assert tag([2, 1, 0]) == [1, 1]

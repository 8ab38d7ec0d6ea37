"""Fuzz harness regression: bounded deterministic campaigns stay crash-free.

Implements the fuzzing the reference lists as pending (Makefile:fuzz →
cargo-fuzz fuzz_verify, README.md:116). Seeds are fixed so failures
reproduce; the campaign that found the truncated-u64/unpack_from crashes
(fixed in proof/types.py and proof/compact.py) is included.
"""

from lambda_snark_tpu.utils import fuzz


def test_fuzz_deserializers_crash_free():
    corpus = fuzz._proof_corpus()
    rep = fuzz.fuzz_deserializers(800, seed=1, _corpus=corpus)
    assert rep.ok, rep.crashes[:3]
    assert rep.rejected > 0 and rep.parsed_ok > 0  # both regimes exercised


def test_fuzz_circuit_parser_crash_free(tmp_path):
    rep = fuzz.fuzz_circuit_parser(400, seed=1, tmp_dir=str(tmp_path))
    assert rep.ok, rep.crashes[:3]
    assert rep.rejected > 0


def test_fuzz_verify_crash_free():
    corpus = fuzz._proof_corpus()
    rep = fuzz.fuzz_verify(400, seed=1, _corpus=corpus)
    assert rep.ok, rep.crashes[:3]


def test_truncation_regression():
    """Every prefix of every proof kind parses to a typed error or a valid
    object — the exact defect class the first campaign found."""
    from lambda_snark_tpu.core.errors import LambdaSnarkError
    from lambda_snark_tpu.proof.types import deserialize_any

    _r1cs, _ctx, corpus, binding, _r45, _rgl = fuzz._proof_corpus()
    for data in corpus:
        for cut in range(0, len(data), 7):
            try:
                deserialize_any(data[:cut]).to_bytes()
            except LambdaSnarkError:
                pass
    from lambda_snark_tpu.proof.checks import WitnessBinding

    for cut in range(0, len(binding), 5):
        try:
            WitnessBinding.from_bytes(binding[:cut]).to_bytes()
        except LambdaSnarkError:
            pass


def test_fri_query_roundtrip_over_255_openings():
    """Aggregated (kind-8) queries open one group per statement; S >= 256
    exceeds a u8 count field (the LE16 wire regression from the aggregate
    scaling sweep, carried over to wire v3's group openings)."""
    from lambda_snark_tpu.proof.fri import FriQuery, GroupOpening, LayerOpening

    gop = GroupOpening((1, 2, 3, 4, 5, 6, 7, 8), (b"\x11" * 32,))
    lop = LayerOpening(1, 2, (b"\x11" * 32,))
    q = FriQuery(tuple([gop] * 300), tuple([lop] * 3))
    data = q.to_bytes()
    got, off = FriQuery.read(data, 0)
    assert off == len(data)
    assert got == q

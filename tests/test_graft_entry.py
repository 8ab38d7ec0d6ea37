"""Driver entry-point contract: entry() compiles, dryrun_multichip runs."""

import sys

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def graft():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    return g


def test_entry_jittable(graft):
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    q_pl, a_pl, b_pl, c_pl, comm_pl, valid = out
    assert np.asarray(valid).all()
    assert q_pl.shape[0] == 3  # q45 digit planes
    assert comm_pl.shape[0] == 4  # Goldilocks ring planes


def test_dryrun_multichip_8(graft):
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2(graft, monkeypatch):
    # mesh-shape coverage only — the production m=2^10 size is already
    # covered by the 8-device run above; m=64 halves this test's compiles
    monkeypatch.setenv("DRYRUN_M", "64")
    graft.dryrun_multichip(2)

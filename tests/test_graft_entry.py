"""Keep the driver entry points honest: entry() must jit, dryrun_multichip
must compile + run the sharded step on the virtual CPU mesh."""

import sys
from pathlib import Path

import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as G  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = G.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (16, 128)
    assert out.dtype == jax.numpy.uint16


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    G.dryrun_multichip(8)


def test_dryrun_multichip_2():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    G.dryrun_multichip(2)

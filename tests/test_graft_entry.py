"""Driver-contract checks: entry() compiles single-chip, dryrun runs on the
virtual 8-device mesh (the same validation path the driver uses)."""

import sys

import jax

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 3
    assert bool(jax.numpy.isfinite(out).all())


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)

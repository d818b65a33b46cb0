"""The driver contract: entry() compile-checks and dryrun_multichip runs on
the virtual 8-device CPU mesh."""

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (8, 128, 80)
    assert out[1].shape == (8, 128, 1)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)

"""Multi-host (DCN) serving-step dryrun: two jax.distributed CPU processes
form a global (dp x tp) mesh and execute one sharded step (SURVEY §2.9).
Subprocess-based, so it runs regardless of this process's backend."""

def test_multihost_dryrun():
    import __graft_entry__ as g  # repo root is on sys.path via conftest

    g.dryrun_multihost(2, 2)

"""Driver entry-point contract: ``dryrun_multichip`` must succeed both
when enough devices exist (direct path) and when they don't (self-
provisioned virtual-CPU subprocess — the condition under the pinned
single-chip axon platform that failed round 1's external gate)."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import pytest


def test_dryrun_direct_path_on_8_devices():
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)  # must not raise


@pytest.mark.slow
def test_dryrun_respawns_when_devices_insufficient():
    """16 > 8 available devices -> subprocess with 16 virtual CPU devices."""
    import __graft_entry__ as g

    assert len(jax.devices()) < 16
    g.dryrun_multichip(16)  # must not raise


def test_respawn_decision_never_dials_the_backend(monkeypatch):
    """Under the pinned axon platform the respawn decision must come from
    the platform config string alone: calling jax.devices() dials the
    remote tunnel, and a tunnel outage would block the driver's dryrun
    forever instead of respawning onto virtual CPU devices."""
    import __graft_entry__ as g

    calls = {}

    class _Config:
        jax_platforms = "axon,cpu"

    class _JaxStub:
        config = _Config()

        @staticmethod
        def devices():
            raise AssertionError("dryrun dialed the backend before respawning")

    monkeypatch.delenv("COMORAG_DRYRUN_CHILD", raising=False)
    monkeypatch.setattr(g, "jax", _JaxStub)
    monkeypatch.setattr(
        g, "_respawn_with_virtual_devices", lambda n: calls.setdefault("n", n)
    )
    g.dryrun_multichip(8)
    assert calls == {"n": 8}


def test_respawn_failure_propagates(monkeypatch):
    """A failing child must surface as a nonzero-rc RuntimeError, not a
    silent pass (the driver records ok=false from the exception)."""
    import __graft_entry__ as g

    monkeypatch.setenv("COMORAG_DRYRUN_CHILD", "1")
    with pytest.raises(RuntimeError, match="devices"):
        g.dryrun_multichip(len(jax.devices()) + 1)

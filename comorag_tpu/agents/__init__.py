from comorag_tpu.agents.pool_agent import PoolAgent
from comorag_tpu.agents.probe_agent import ProbeAgent

__all__ = ["PoolAgent", "ProbeAgent"]

from .apply import CdcApplier
from .dedup import lww_dedup
from .generator import generate_changes, strip_evolution
from .planner import ReplayPlan, plan_replay
from .validate import split_valid

__all__ = [
    "CdcApplier",
    "lww_dedup",
    "generate_changes",
    "strip_evolution",
    "ReplayPlan",
    "plan_replay",
    "split_valid",
]

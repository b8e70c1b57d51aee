"""Baseline TTA methods (reference baselines/, dispatched by
setup_baseline.py:17-44): source / NORM / TENT / SHOT / DUA / T3A.

Each baseline is a small class owning its jitted step functions and a
``run(dataset)`` host loop returning top-1.  Unlike the reference —
which mutates module modes (``.train()``/``requires_grad_``) — behavior
differences are expressed through the models' explicit flags:

* BN batch-stat normalization  == ``use_running_average=False``;
* BN running-stat updates      == ``update_running_stats=True``;
* parameter freezing           == optimizer masks.
"""

from vitta_tpu.baselines.source import SourceBaseline  # noqa: F401
from vitta_tpu.baselines.norm import NormBaseline  # noqa: F401
from vitta_tpu.baselines.tent import TentBaseline  # noqa: F401
from vitta_tpu.baselines.shot import ShotBaseline  # noqa: F401
from vitta_tpu.baselines.dua import DuaBaseline  # noqa: F401
from vitta_tpu.baselines.t3a import T3ABaseline  # noqa: F401


def setup_baseline(name: str, model, cfg, variables, **kw):
    """Dispatch (reference setup_baseline.py:17-44)."""
    cls = {
        "source": SourceBaseline,
        "norm": NormBaseline,
        "tent": TentBaseline,
        "shot": ShotBaseline,
        "dua": DuaBaseline,
        "t3a": T3ABaseline,
    }[name]
    return cls(model, cfg, variables, **kw)

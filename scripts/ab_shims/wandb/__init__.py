"""Recording wandb shim for the reference A/B harness.

The reference guards every ``wandb.log`` behind ``if wandb.run`` (e.g.
``train.py:144``, ``validation.py:145``) and degrades gracefully when
``init`` fails (``utils.py:206-207``). This shim makes ``init`` succeed and
records every logged metric dict as a JSON line to the path in
``$AB_WANDB_JSONL`` — that file IS the reference-side trajectory the A/B
compares against our jsonl backend output.
"""

import json
import os

run = None
config = None


class _Config(dict):
    def __repr__(self):  # printed by the reference (utils.py:205)
        return f"ab-shim config ({len(self)} keys)"


class _Run:
    def __init__(self, cfg):
        self.config = cfg
        self.name = "ab-shim"
        self.id = "ab-shim"


class Image:
    def __init__(self, *args, **kwargs):
        pass


class Html:
    def __init__(self, *args, **kwargs):
        pass


def init(project=None, entity=None, config=None, **kwargs):
    global run
    cfg = _Config(config or {})
    run = _Run(cfg)
    globals()["config"] = cfg
    return run


def _emit(obj):
    path = os.environ.get("AB_WANDB_JSONL")
    if not path:
        return
    with open(path, "a") as f:
        f.write(json.dumps(obj, default=str) + "\n")


def log(metrics, step=None, **kwargs):
    scalars = {
        k: float(v)
        for k, v in metrics.items()
        if isinstance(v, (int, float))
    }
    _emit({"step": step, **scalars})


def watch(*args, **kwargs):
    pass


def save(*args, **kwargs):
    pass


def finish(exit_code=0, **kwargs):
    global run
    run = None


# ``wandb.summary["key"] = value`` item assignment (reference main.py:434)
summary = {}

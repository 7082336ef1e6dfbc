"""fvcore shim: the reference's final report wants analytic FLOPs
(``utils.py:328-340``); the A/B compares training trajectories, not the
FLOP table, so this returns zeros (the reference already try/excepts this
path into -1 placeholders)."""


class FlopCountAnalysis:
    def __init__(self, model, inputs):
        pass

    def total(self):
        return 0.0


def flop_count_table(analyzer, max_depth=3):
    return "(fvcore shim: no FLOP table)"

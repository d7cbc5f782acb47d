"""torchmetrics stub: import-time only (metrics/eval_metrics modules)."""
import torch.nn as nn


class MetricCollection(nn.ModuleDict):
    def __init__(self, metrics=None, *a, **k):
        super().__init__()

    def update(self, *a, **k):
        pass

    def compute(self):
        return {}

    def reset(self):
        pass

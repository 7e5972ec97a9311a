import torch
import torch.nn as nn


class StochasticDepth(nn.Module):
    """torchvision.ops.StochasticDepth ("row" mode); identity in eval."""

    def __init__(self, p: float, mode: str = "row"):
        super().__init__()
        self.p = float(p)
        self.mode = mode

    def forward(self, x):
        if self.p == 0.0 or not self.training:
            return x
        survival = 1.0 - self.p
        if self.mode == "row":
            shape = [x.shape[0]] + [1] * (x.ndim - 1)
        else:
            shape = [1] * x.ndim
        noise = torch.empty(shape, dtype=x.dtype, device=x.device)
        noise = noise.bernoulli_(survival)
        if survival > 0.0:
            noise.div_(survival)
        return x * noise

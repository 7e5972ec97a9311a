from .stochastic_depth import StochasticDepth  # noqa: F401

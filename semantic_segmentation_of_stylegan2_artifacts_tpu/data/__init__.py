from .dataset import SegArtifactDataset, SegArtifactNoLabelDataset  # noqa: F401
from .sampler import BatchPatternSampler  # noqa: F401
from .augment import RandomGenerator  # noqa: F401
from .pipeline import TrainLoader, EvalLoader  # noqa: F401

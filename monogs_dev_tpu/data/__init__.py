from .datasets import load_dataset, BaseDataset
from .synthetic import SyntheticDataset, make_synthetic_scene

__all__ = ["load_dataset", "BaseDataset", "SyntheticDataset", "make_synthetic_scene"]

from expann_tpu.data.dataset import TestDataset
from expann_tpu.data.loader import (
    load_synthetic_uniform_sphere_points,
    load_sift1m,
    load_sift1m_custom,
    read_vecs,
)

__all__ = [
    "TestDataset",
    "load_synthetic_uniform_sphere_points",
    "load_sift1m",
    "load_sift1m_custom",
    "read_vecs",
]

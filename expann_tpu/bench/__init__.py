from expann_tpu.bench.bench_data import BenchData
from expann_tpu.bench.manager import BenchDataManager
from expann_tpu.bench.harness import get_benchmark_data

__all__ = ["BenchData", "BenchDataManager", "get_benchmark_data"]

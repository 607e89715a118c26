"""Shim: the pandas TPC-H oracle lives in the package so the benchmark
runner can use it as a baseline column (`runner --verify`)."""
from ballista_tpu.benchmarks.oracle import *          # noqa: F401,F403
from ballista_tpu.benchmarks.oracle import ORACLES, to_pd  # noqa: F401

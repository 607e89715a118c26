"""ballista_tpu — TPU-native distributed vectorized SQL query engine.

A ground-up reimplementation of the capabilities of coralogix/arrow-ballista
(distributed Arrow/DataFusion SQL engine, see SURVEY.md) designed for TPU:
relational operators are jit-compiled array programs over fixed-shape SoA
columnar batches; queries split into a stage DAG at repartition boundaries;
the distributed shuffle is an all-to-all collective over a jax.sharding.Mesh
instead of Flight-over-gRPC shuffle files.
"""

import jax

# Exact decimal arithmetic needs real int64 (TPC-H money columns sum past
# 2^31); JAX defaults to 32-bit unless x64 is enabled. TPU executes int64
# as emulated pairs of int32 — fine for our integer decimal path.
jax.config.update("jax_enable_x64", True)

from . import schema  # noqa: E402
from . import batch  # noqa: E402
from . import exprs  # noqa: E402

__version__ = "0.1.0"

from .mesh import make_mesh, partition_axis
from .partitioned import PartitionedBatch, partition_arrow, gather_partitions
from .shuffle import hash_partition_exchange

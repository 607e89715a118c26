from .distributed_planner import DistributedPlanner, DistributedPlan, Stage
from .runtime import DistributedRuntime

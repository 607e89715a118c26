from .dot import distributed_plan_dot, logical_plan_dot

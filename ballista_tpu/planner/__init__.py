from .logical import (Aggregate, Distinct, Filter, Join, Limit, LogicalPlan,
                      Projection, Sort, TableScan)
from .physical import create_physical_plan

"""SQL frontend: lexer -> parser -> logical planner.

Reference parity: Ballista delegates SQL to DataFusion's sqlparser + SQL
planner (`BallistaContext::sql`, client/src/context.rs:362). We implement a
recursive-descent parser covering the TPC-H dialect (SELECT/FROM/WHERE/
GROUP BY/HAVING/ORDER BY/LIMIT, joins incl. implicit comma joins, CASE,
BETWEEN/IN/LIKE/EXISTS, date & interval literals, derived tables).
"""

from .parser import parse_sql
from .planner import plan_sql

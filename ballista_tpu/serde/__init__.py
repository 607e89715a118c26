from .plans import decode_expr, decode_plan, encode_expr, encode_plan

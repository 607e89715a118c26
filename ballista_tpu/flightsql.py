"""Arrow FlightSQL protocol envelope (hand-rolled protobuf wire format).

Reference parity: `scheduler/src/flight_sql.rs` speaks the Arrow FlightSQL
protocol — FlightDescriptor commands are `google.protobuf.Any`-wrapped
messages from arrow/flight/protocol/sql (CommandStatementQuery,
CommandGetTables, ...), tickets are Any-wrapped TicketStatementQuery.
pyarrow ships no FlightSQL bindings, so the handful of messages needed are
encoded/decoded directly (protobuf wire format: varint keys, length-
delimited strings/bytes).

Message shapes (arrow FlightSql.proto):
  CommandStatementQuery   { 1: string query }
  TicketStatementQuery    { 1: bytes statement_handle }
  CommandGetCatalogs      { }
  CommandGetDbSchemas     { 1: optional string catalog, 2: filter }
  CommandGetTables        { 1..4: filters, 5: bool include_schema }
  ActionCreatePreparedStatementRequest  { 1: string query }
  ActionCreatePreparedStatementResult   { 1: bytes handle, ... }
  CommandPreparedStatementQuery { 1: bytes prepared_statement_handle }
google.protobuf.Any { 1: string type_url, 2: bytes value }
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

SQL_NS = "type.googleapis.com/arrow.flight.protocol.sql."


# -- protobuf wire helpers --

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _field_bytes(field: int, payload: bytes) -> bytes:
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def _field_varint(field: int, value: int) -> bytes:
    return _varint(field << 3) + _varint(value)


def parse_fields(buf: bytes) -> Dict[int, list]:
    """Decode a protobuf message into {field_number: [values]} (bytes for
    length-delimited, int for varint; other wire types skipped)."""
    out: Dict[int, list] = {}
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
            out.setdefault(field, []).append(v)
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            out.setdefault(field, []).append(buf[i:i + ln])
            i += ln
        elif wt == 5:
            i += 4
        elif wt == 1:
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
    return out


# -- Any envelope --

def pack_any(type_name: str, payload: bytes) -> bytes:
    return (_field_bytes(1, (SQL_NS + type_name).encode())
            + _field_bytes(2, payload))


def unpack_any(buf: bytes) -> Optional[Tuple[str, bytes]]:
    """Returns (short type name, payload) or None if not an Any from the
    FlightSQL namespace."""
    try:
        f = parse_fields(buf)
    except (ValueError, IndexError):
        return None
    if 1 not in f:
        return None
    url = f[1][0].decode("utf-8", errors="replace")
    if not url.startswith(SQL_NS):
        return None
    payload = f[2][0] if 2 in f else b""
    return url[len(SQL_NS):], payload


# -- message constructors / parsers --

def command_statement_query(query: str) -> bytes:
    return pack_any("CommandStatementQuery",
                    _field_bytes(1, query.encode()))


def parse_statement_query(payload: bytes) -> str:
    return parse_fields(payload)[1][0].decode()


def ticket_statement_query(handle: bytes) -> bytes:
    return pack_any("TicketStatementQuery", _field_bytes(1, handle))


def parse_ticket_statement(payload: bytes) -> bytes:
    return parse_fields(payload)[1][0]


def prepared_statement_result(handle: bytes) -> bytes:
    """ActionCreatePreparedStatementResult body (returned inside a Flight
    Result, itself just bytes)."""
    return pack_any("ActionCreatePreparedStatementResult",
                    _field_bytes(1, handle))


def parse_prepared_query(payload: bytes) -> bytes:
    return parse_fields(payload)[1][0]


def command_get_tables() -> bytes:
    return pack_any("CommandGetTables", b"")

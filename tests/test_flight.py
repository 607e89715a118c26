"""Arrow Flight endpoint: FlightSQL-style SQL over the wire.

Reference parity: scheduler FlightSQL service (flight_sql.rs:80) +
executor Flight result fetch (flight_service.rs:74)."""

import decimal
import json

import pyarrow as pa
import pyarrow.flight as fl
import pytest

from ballista_tpu.client import SessionContext
from ballista_tpu.flight import BallistaFlightServer, flight_query


@pytest.fixture(scope="module")
def server():
    ctx = SessionContext()
    ctx.register_arrow("t", pa.table({
        "g": pa.array(["a", "a", "b"]),
        "v": pa.array([1, 2, 3], pa.int64()),
        "price": pa.array([decimal.Decimal("1.50"), decimal.Decimal("2.25"),
                           None], pa.decimal128(10, 2)),
    }))
    srv = BallistaFlightServer(ctx=ctx)
    yield srv, f"grpc://127.0.0.1:{srv.port}"
    srv.shutdown()


def test_get_flight_info_and_do_get(server):
    srv, endpoint = server
    client = fl.connect(endpoint)
    info = client.get_flight_info(fl.FlightDescriptor.for_command(
        b"select g, sum(v) as s from t group by g order by g"))
    assert info.total_records == 2
    table = client.do_get(info.endpoints[0].ticket).read_all()
    assert table.column("g").to_pylist() == ["a", "b"]
    assert table.column("s").to_pylist() == [3, 3]


def test_one_shot_ticket(server):
    srv, endpoint = server
    client = fl.connect(endpoint)
    table = client.do_get(fl.Ticket(b"select count(*) c from t")).read_all()
    assert table.column("c").to_pylist() == [3]


def test_decimal_exact_over_wire(server):
    srv, endpoint = server
    table = flight_query(endpoint, "select price from t order by v")
    vals = table.column("price").to_pylist()
    assert vals[0] == decimal.Decimal("1.50")
    assert vals[1] == decimal.Decimal("2.25")
    assert vals[2] is None
    assert pa.types.is_decimal(table.schema.field("price").type)


def test_list_flights(server):
    srv, endpoint = server
    client = fl.connect(endpoint)
    flights = list(client.list_flights())
    assert len(flights) == 1
    assert flights[0].total_records == 3


def test_explain_action(server):
    srv, endpoint = server
    client = fl.connect(endpoint)
    out = list(client.do_action(fl.Action(
        "explain", b"select v from t where v > 1")))
    text = out[0].body.to_pybytes().decode()
    assert "Filter" in text and "Projection" in text


def test_unknown_ticket_rejected(server):
    srv, endpoint = server
    client = fl.connect(endpoint)
    with pytest.raises(fl.FlightServerError):
        client.do_get(fl.Ticket(json.dumps({"ticket": "nope"}).encode())
                      ).read_all()


def test_flightsql_statement_query(server):
    """Real FlightSQL wire envelope: Any-wrapped CommandStatementQuery in
    the descriptor, Any-wrapped TicketStatementQuery back (what a JDBC
    FlightSQL driver sends; flight_sql.rs parity)."""
    from ballista_tpu import flightsql as fsql
    srv, endpoint = server
    client = fl.connect(endpoint)
    cmd = fsql.command_statement_query(
        "select g, sum(v) as s from t group by g order by g")
    info = client.get_flight_info(fl.FlightDescriptor.for_command(cmd))
    # ticket must be an Any-wrapped TicketStatementQuery
    kind, payload = fsql.unpack_any(info.endpoints[0].ticket.ticket)
    assert kind == "TicketStatementQuery"
    table = client.do_get(info.endpoints[0].ticket).read_all()
    assert table.column("s").to_pylist() == [3, 3]


def test_flightsql_get_tables(server):
    from ballista_tpu import flightsql as fsql
    srv, endpoint = server
    client = fl.connect(endpoint)
    cmd = fsql.command_get_tables()
    info = client.get_flight_info(fl.FlightDescriptor.for_command(cmd))
    table = client.do_get(info.endpoints[0].ticket).read_all()
    assert "t" in table.column("table_name").to_pylist()
    assert table.schema.field("table_type").type == pa.string()


def test_flightsql_roundtrip_encoding():
    from ballista_tpu import flightsql as fsql
    cmd = fsql.command_statement_query("select 1")
    kind, payload = fsql.unpack_any(cmd)
    assert kind == "CommandStatementQuery"
    assert fsql.parse_statement_query(payload) == "select 1"
    t = fsql.ticket_statement_query(b"handle123")
    kind, payload = fsql.unpack_any(t)
    assert kind == "TicketStatementQuery"
    assert fsql.parse_ticket_statement(payload) == b"handle123"

def test_prepared_statement_lifecycle(server):
    """CreatePreparedStatement -> CommandPreparedStatementQuery ->
    ClosePreparedStatement (flight_sql.rs statement lifecycle)."""
    from ballista_tpu import flightsql as fsql
    srv, endpoint = server
    client = fl.connect(endpoint)
    req = fsql.pack_any("ActionCreatePreparedStatementRequest",
                        fsql._field_bytes(
                            1, b"select sum(v) as s from t"))
    res = list(client.do_action(fl.Action("CreatePreparedStatement", req)))
    any_msg = fsql.unpack_any(res[0].body.to_pybytes())
    assert any_msg[0] == "ActionCreatePreparedStatementResult"
    handle = fsql.parse_prepared_query(any_msg[1])
    # execute by handle
    cmd = fsql.pack_any("CommandPreparedStatementQuery",
                        fsql._field_bytes(1, handle))
    info = client.get_flight_info(fl.FlightDescriptor.for_command(cmd))
    table = client.do_get(info.endpoints[0].ticket).read_all()
    assert table.column("s").to_pylist() == [6]
    # close, then the handle is gone
    close = fsql.pack_any("ActionClosePreparedStatementRequest",
                          fsql._field_bytes(1, handle))
    list(client.do_action(fl.Action("ClosePreparedStatement", close)))
    with pytest.raises(fl.FlightError):
        client.get_flight_info(fl.FlightDescriptor.for_command(cmd))


def test_handshake_bearer_auth():
    """Handshake issues a bearer token; wrong creds rejected
    (flight_sql.rs:80 handshake parity)."""
    ctx = SessionContext()
    ctx.register_arrow("t", pa.table({"v": pa.array([1, 2], pa.int64())}))
    srv = BallistaFlightServer(ctx=ctx, auth=("admin", "secret"))
    endpoint = f"grpc://127.0.0.1:{srv.port}"
    try:
        client = fl.connect(endpoint)
        with pytest.raises(fl.FlightError):
            client.do_get(fl.Ticket(b"select * from t")).read_all()
        client.authenticate_basic_token  # API presence
        class CliAuth(fl.ClientAuthHandler):
            def __init__(self):
                super().__init__()
                self.token = None
            def authenticate(self, outgoing, incoming):
                outgoing.write(fl.BasicAuth(b"admin", b"secret").serialize())
                self.token = incoming.read()
            def get_token(self):
                return self.token
        client.authenticate(CliAuth())
        t = client.do_get(fl.Ticket(b"select sum(v) as s from t")).read_all()
        assert t.column("s").to_pylist() == [3]
        # bad credentials fail the handshake
        bad = fl.connect(endpoint)
        class BadAuth(CliAuth):
            def authenticate(self, outgoing, incoming):
                outgoing.write(fl.BasicAuth(b"admin", b"wrong").serialize())
                self.token = incoming.read()
        with pytest.raises(fl.FlightError):
            bad.authenticate(BadAuth())
    finally:
        srv.shutdown()

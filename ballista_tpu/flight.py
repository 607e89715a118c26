"""Arrow Flight endpoint: network SQL + result streaming.

Reference parity (two services in one):
- the scheduler's FlightSQL endpoint (`scheduler/src/flight_sql.rs:80`) —
  clients submit SQL, receive a FlightInfo (schema + endpoints + ticket)
  and stream results with do_get; catalog metadata via list_flights and
  actions. JDBC/ODBC-style access without the Rust FlightSQL statement
  message envelope: commands are UTF-8 SQL or JSON {"query": ...}.
- the executor Flight shuffle/result service (`flight_service.rs:74`) —
  do_get with a job-result ticket streams a finished job's partitions.

The data plane speaks Arrow IPC on the wire (LZ4/ZSTD via pyarrow Flight's
gRPC transport), matching the reference's Flight data path; results come
off the mesh exactly once per job and are cached for ticket fetches.
"""

from __future__ import annotations

import json
import threading
import uuid
from typing import Dict, Optional, Tuple

import pyarrow as pa
import pyarrow.flight as fl

from . import batch as B


def _sql_of(command: bytes) -> str:
    text = command.decode("utf-8", errors="replace")
    try:
        obj = json.loads(text)
        if isinstance(obj, dict) and "query" in obj:
            return obj["query"]
    except (json.JSONDecodeError, UnicodeDecodeError):
        pass
    return text


class _BearerAuthHandler(fl.ServerAuthHandler):
    """Handshake issues a bearer token for valid BasicAuth credentials
    (flight_sql.rs:80 handshake/bearer parity)."""

    def __init__(self, user: str, password: str):
        super().__init__()
        self._user = user
        self._password = password
        self._tokens: set = set()

    def authenticate(self, outgoing, incoming):
        auth = fl.BasicAuth.deserialize(incoming.read())
        if (auth.username.decode() != self._user
                or auth.password.decode() != self._password):
            raise fl.FlightUnauthenticatedError("bad credentials")
        token = uuid.uuid4().hex.encode()
        self._tokens.add(token)
        outgoing.write(token)

    def is_valid(self, token):
        if token in self._tokens:
            return token
        raise fl.FlightUnauthenticatedError("invalid or missing token")


class BallistaFlightServer(fl.FlightServerBase):
    """Flight front door over a SessionContext or StandaloneCluster.

    Flow (FlightSQL-style):
      info = client.get_flight_info(FlightDescriptor.for_command(sql))
      reader = client.do_get(info.endpoints[0].ticket)     # Arrow stream
    One-shot: client.do_get(Ticket(sql)) also works (DistributedQueryExec
    fetch-with-inline-plan analog).
    """

    def __init__(self, ctx=None, cluster=None,
                 location: str = "grpc://127.0.0.1:0",
                 auth: Optional[Tuple[str, str]] = None):
        """`auth=(user, password)`: enable the handshake/bearer-token flow
        (flight_sql.rs:80 issues bearer tokens the same way); None = open."""
        handler = _BearerAuthHandler(*auth) if auth is not None else None
        super().__init__(location, auth_handler=handler)
        if ctx is None and cluster is None:
            raise ValueError("need a SessionContext or StandaloneCluster")
        self.cluster = cluster
        self.ctx = ctx if ctx is not None else cluster.ctx
        self._results: Dict[str, pa.Table] = {}
        # prepared-statement registry: handle -> SQL (flight_sql.rs
        # statement lifecycle; created/closed via do_action)
        self._prepared: Dict[bytes, str] = {}
        self._lock = threading.Lock()

    # -- execution --

    def _run_sql(self, sql: str) -> pa.Table:
        if self.cluster is not None:
            job_id = self.cluster.submit_sql(sql)
            batch, schema = self.cluster.wait(job_id)
            return B.to_arrow(batch, schema)
        return self.ctx.sql(sql).to_arrow()

    # -- FlightSQL protocol dispatch (flightsql.py wire helpers) --

    def _catalog_tables(self) -> pa.Table:
        """CommandGetTables result (FlightSQL GetTables schema)."""
        names = sorted(self.ctx.tables)
        return pa.table({
            "catalog_name": pa.array(["ballista"] * len(names)),
            "db_schema_name": pa.array(["public"] * len(names)),
            "table_name": pa.array(names),
            "table_type": pa.array(["TABLE"] * len(names)),
        })

    def _flightsql_table(self, kind: str, payload: bytes) -> Optional[pa.Table]:
        from . import flightsql as fsql
        if kind == "CommandStatementQuery":
            return self._run_sql(fsql.parse_statement_query(payload))
        if kind == "CommandPreparedStatementQuery":
            handle = fsql.parse_prepared_query(payload)
            with self._lock:
                sql = self._prepared.get(handle)
            if sql is None:
                raise fl.FlightServerError("unknown prepared statement")
            return self._run_sql(sql)
        if kind == "CommandGetTables":
            return self._catalog_tables()
        if kind == "CommandGetCatalogs":
            return pa.table({"catalog_name": pa.array(["ballista"])})
        if kind == "CommandGetDbSchemas":
            return pa.table({"catalog_name": pa.array(["ballista"]),
                             "db_schema_name": pa.array(["public"])})
        return None

    # -- Flight verbs --

    def get_flight_info(self, context, descriptor):
        from . import flightsql as fsql
        table = None
        any_msg = fsql.unpack_any(descriptor.command)
        if any_msg is not None:
            table = self._flightsql_table(*any_msg)
        if table is None:
            table = self._run_sql(_sql_of(descriptor.command))
        ticket_id = uuid.uuid4().hex
        with self._lock:
            self._results[ticket_id] = table
        if any_msg is not None:
            ticket_bytes = fsql.ticket_statement_query(ticket_id.encode())
        else:
            ticket_bytes = json.dumps({"ticket": ticket_id}).encode()
        endpoint = fl.FlightEndpoint(ticket_bytes, [])
        return fl.FlightInfo(table.schema, descriptor, [endpoint],
                             table.num_rows, table.nbytes)

    def do_get(self, context, ticket):
        from . import flightsql as fsql
        raw = ticket.ticket
        any_msg = fsql.unpack_any(raw)
        if any_msg is not None:
            kind, payload = any_msg
            if kind == "TicketStatementQuery":
                tid = fsql.parse_ticket_statement(payload).decode()
                with self._lock:
                    table = self._results.pop(tid, None)
                if table is None:
                    raise fl.FlightServerError(
                        "unknown or already-fetched ticket")
                return fl.RecordBatchStream(table)
            table = self._flightsql_table(kind, payload)
            if table is not None:
                return fl.RecordBatchStream(table)
            raise fl.FlightServerError(f"unsupported FlightSQL ticket {kind}")
        try:
            obj = json.loads(raw.decode("utf-8"))
        except (json.JSONDecodeError, UnicodeDecodeError):
            obj = None
        if isinstance(obj, dict) and "ticket" in obj:
            with self._lock:
                table = self._results.pop(obj["ticket"], None)
            if table is None:
                raise fl.FlightServerError("unknown or already-fetched ticket")
        else:
            table = self._run_sql(_sql_of(raw))
        return fl.RecordBatchStream(table)

    def list_flights(self, context, criteria):
        for name, tp in self.ctx.tables.items():
            desc = fl.FlightDescriptor.for_path(name)
            schema = B.schema_to_arrow(tp.schema)
            endpoint = fl.FlightEndpoint(
                json.dumps({"query": f"select * from {name}"}).encode(), [])
            yield fl.FlightInfo(schema, desc, [endpoint],
                                int(tp.arrow_table.num_rows), -1)

    def list_actions(self, context):
        return [("explain", "logical plan for a SQL string"),
                ("jobs", "job list (standalone cluster only)"),
                ("CreatePreparedStatement", "FlightSQL prepared statement"),
                ("ClosePreparedStatement", "FlightSQL prepared statement")]

    def do_action(self, context, action):
        from . import flightsql as fsql
        if action.type == "CreatePreparedStatement":
            # body: Any-wrapped ActionCreatePreparedStatementRequest
            # {1: query}; result: Any-wrapped ...Result {1: handle}
            raw = action.body.to_pybytes()
            any_msg = fsql.unpack_any(raw)
            sql = (fsql.parse_statement_query(any_msg[1])
                   if any_msg is not None else _sql_of(raw))
            handle = uuid.uuid4().hex.encode()
            with self._lock:
                self._prepared[handle] = sql
            yield fsql.prepared_statement_result(handle)
            return
        if action.type == "ClosePreparedStatement":
            raw = action.body.to_pybytes()
            any_msg = fsql.unpack_any(raw)
            handle = (fsql.parse_prepared_query(any_msg[1])
                      if any_msg is not None else raw)
            with self._lock:
                self._prepared.pop(handle, None)
            return
        if action.type == "explain":
            sql = _sql_of(action.body.to_pybytes())
            plan = self.ctx.sql(sql).plan
            yield plan.display().encode()
        elif action.type == "jobs":
            if self.cluster is None:
                yield b"[]"
            else:
                sched = self.cluster.scheduler
                jobs = [sched.job_status(jid)
                        for jid in sched.task_manager.jobs]
                yield json.dumps(jobs).encode()
        else:
            raise fl.FlightServerError(f"unknown action {action.type!r}")


def flight_query(endpoint: str, sql: str) -> pa.Table:
    """Client helper: submit SQL over Flight, return the Arrow result
    (FlightSQL handshake + fetch in one call)."""
    client = fl.connect(endpoint)
    info = client.get_flight_info(
        fl.FlightDescriptor.for_command(sql.encode()))
    return client.do_get(info.endpoints[0].ticket).read_all()

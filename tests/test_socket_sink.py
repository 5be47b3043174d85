"""SocketSink parity (S4): the distributed socket writer delivers the
exact graphite lines the reference would send, against a real in-process
TCP server."""

from __future__ import annotations

import socketserver
import threading

from gclog_parser_spark.core import calculate_rates, parse_log
from gclog_parser_spark.fixtures import fixture_text
from gclog_parser_spark.functions.export import graphite_lines
from gclog_parser_spark.operators.export import graphite_export
from gclog_parser_spark.operators.parse import parse_events
from gclog_parser_spark.operators.rates import with_rates
from gclog_parser_spark.sources.pages import read_gc_logs
from gclog_parser_spark.sources.sinks import write_socket


class _Collector(socketserver.StreamRequestHandler):
    def handle(self):
        data = self.rfile.read().decode()
        with self.server.lock:
            self.server.received.extend(
                l for l in data.split("\n") if l
            )


def _server():
    srv = socketserver.ThreadingTCPServer(
        ("127.0.0.1", 0), _Collector
    )
    srv.received = []
    srv.lock = threading.Lock()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def test_socket_sink_delivers_reference_graphite_lines(spark, tmp_path):
    name = "details7"
    p = tmp_path / f"{name}.log"
    p.write_text(fixture_text(name))

    evs = parse_log(fixture_text(name))
    want = graphite_lines(evs, rates_list=calculate_rates(evs))

    srv, port = _server()
    try:
        events = with_rates(
            parse_events(read_gc_logs(spark, str(p)), require_marker=False)
        )
        lines = graphite_export(events)
        write_socket(lines, "127.0.0.1", port, batch_size=7)
        got = list(srv.received)
    finally:
        srv.shutdown()
        srv.server_close()

    assert got == want  # one log → one partition → exact order too

"""Shared HTTP server base for every serving surface.

stdlib ThreadingHTTPServer defaults to a listen backlog of 5
(socketserver.TCPServer.request_queue_size): any burst of more than ~5
simultaneous connects gets RST at the socket level before a handler
thread ever runs — measured at client concurrency 32 against the
retrieval server (scripts/bench_serve.py). Batched/coalescing servers
exist precisely to absorb such bursts, so every server in this package
(retrieval API, generation server, fake llama.cpp, web UI) uses this
subclass: accept-queue sized to the burst, daemon handler threads so a
stuck client cannot block interpreter exit.
"""
from __future__ import annotations

from http.server import ThreadingHTTPServer


class BurstHTTPServer(ThreadingHTTPServer):
    request_queue_size = 512
    daemon_threads = True

"""Local generation server: the JAX decoder behind the llama.cpp contract.

A first-party replacement for the reference's external llama.cpp process
(reference: src/llama_client.py:10, endpoints :108-175): serves /health,
/v1/models, /completion, /v1/chat/completions and /chat from a
persian_rag_tpu TextGenerator, so LlamaClient (and everything above it)
runs against an in-process TPU-backed model with zero changes.
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from persian_rag_tpu.gen.generator import TextGenerator


class LocalGenerationServer:
    def __init__(
        self,
        generator: TextGenerator,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.generator = generator
        self._lock = threading.Lock()  # one generation at a time
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _json(self, code, payload):
                body = json.dumps(payload, ensure_ascii=False).encode()
                self.send_response(code)
                self.send_header(
                    "Content-Type", "application/json; charset=utf-8"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._json(200, {"status": "ok"})
                elif self.path == "/v1/models":
                    self._json(
                        200, {"data": [{"id": "persian-rag-tpu-decoder"}]}
                    )
                elif self.path in (
                    "/completion", "/chat", "/v1/chat/completions",
                ):
                    # POST-only endpoints answer GET probes with 405, the
                    # llama.cpp behavior get_server_info relies on
                    # (reference: src/llama_client.py:297)
                    self._json(405, {"error": "method not allowed"})
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                data = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/completion":
                    prompt = data.get("prompt", "")
                elif self.path in ("/v1/chat/completions", "/chat"):
                    messages = data.get("messages", [])
                    prompt = messages[-1]["content"] if messages else ""
                else:
                    self._json(404, {"error": "not found"})
                    return
                with outer._lock:
                    text = outer.generator.generate_text(
                        prompt,
                        max_tokens=int(data.get("max_tokens", 128)),
                        temperature=float(data.get("temperature", 0.0)),
                        top_p=float(data.get("top_p", 0.9)),
                        stop=data.get("stop"),
                    )
                if self.path == "/completion":
                    self._json(200, {"content": text})
                elif self.path == "/v1/chat/completions":
                    self._json(
                        200,
                        {
                            "choices": [
                                {
                                    "message": {
                                        "role": "assistant",
                                        "content": text,
                                    }
                                }
                            ]
                        },
                    )
                else:
                    self._json(200, {"content": text})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self._server.server_address[1]}"

    def start(self) -> "LocalGenerationServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> str:
        self.start()
        return self.url

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.stop()

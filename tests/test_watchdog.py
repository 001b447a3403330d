"""Device-hang watchdog: deadline on blocking syncs + serve 503 behavior.

Rebuild-side analogue of the reference's GpuTimeoutConfig/poll_with_timeout
tests (gpu_ops/timeout.rs:12,73): a wedged device must produce a typed error
(and a 503 from serve), never an indefinitely hung request.
"""

import json
import threading
import time
import urllib.request

import pytest

from kjarni_tpu.core.errors import DeviceTimeoutError
from kjarni_tpu.core.watchdog import block_with_timeout, call_with_timeout


class TestCallWithTimeout:
    def test_fast_call_passes_through(self):
        assert call_with_timeout(lambda: 42, 5.0) == 42

    def test_disabled_timeout_runs_inline(self):
        assert call_with_timeout(lambda: "x", None) == "x"
        assert call_with_timeout(lambda: "x", 0) == "x"

    def test_stuck_call_raises_typed_error(self):
        ev = threading.Event()

        def stuck():
            ev.wait(30)  # mocked wedged device poll
            return "never"

        t0 = time.perf_counter()
        with pytest.raises(DeviceTimeoutError):
            call_with_timeout(stuck, 0.1, "mock sync")
        assert time.perf_counter() - t0 < 5
        ev.set()  # release the watchdog thread

    def test_exception_propagates(self):
        with pytest.raises(ValueError):
            call_with_timeout(lambda: (_ for _ in ()).throw(ValueError("boom")),
                              1.0)

    def test_block_with_timeout_returns_tree(self):
        import jax.numpy as jnp
        x = jnp.arange(4)
        out = block_with_timeout({"a": x}, 10.0)
        assert out["a"].shape == (4,)


class TestServe503:
    def test_wedged_request_returns_503_not_hang(self):
        from http.server import ThreadingHTTPServer
        from kjarni_tpu.serve import make_handler

        release = threading.Event()

        class StuckEngine:
            request_timeout_s = 0.2

            def handle(self, path, body):
                release.wait(30)  # mocked stuck device future
                return {"text": "never"}

        srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(StuckEngine()))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.server_port}/v1/generate",
                data=json.dumps({"prompt": "hi"}).encode(),
                headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            try:
                urllib.request.urlopen(req, timeout=10)
                raise AssertionError("expected HTTP 503")
            except urllib.error.HTTPError as e:
                assert e.code == 503
                body = json.loads(e.read())
                assert "deadline" in body["error"]
            assert time.perf_counter() - t0 < 8
        finally:
            release.set()
            srv.shutdown()

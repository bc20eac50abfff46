import os
import threading
import time

import pytest

from ngstpu.testing.fixtures import random_fastq
from ngstpu.tools import server as srvmod


def test_server_roundtrip(tmp_path):
    sock = str(tmp_path / "ngs.sock")
    t = threading.Thread(target=srvmod.serve, args=(sock,), daemon=True)
    t.start()
    for _ in range(100):
        if os.path.exists(sock):
            break
        time.sleep(0.05)
    assert os.path.exists(sock)

    p = tmp_path / "x.fq"
    p.write_bytes(random_fastq(100, read_len=50, seed=99))

    import contextlib
    import io

    buf = io.StringIO()

    class _Cap(io.StringIO):
        @property
        def buffer(self):
            return self._b

    # capture stdout bytes from call_server
    import sys
    old = sys.stdout
    bio = io.BytesIO()

    class _Out:
        buffer = bio

        def write(self, s):
            bio.write(s.encode())

        def flush(self):
            pass

    sys.stdout = _Out()
    try:
        rc = srvmod.call_server(sock, "fastq_count", [str(p)])
    finally:
        sys.stdout = old
    assert rc == 0
    out = bio.getvalue().decode()
    assert out.startswith(str(p)) and "\t100\t" in out

    # second call reuses the warm process
    sys.stdout = _Out()
    try:
        rc2 = srvmod.call_server(sock, "fastq_count", [str(p)])
    finally:
        sys.stdout = old
    assert rc2 == 0

    # unknown tool handled without killing the server
    sys.stdout = _Out()
    try:
        rc3 = srvmod.call_server(sock, "nope", [])
    finally:
        sys.stdout = old
    assert rc3 == 2

    # shutdown
    import json
    import socket as socklib

    s = socklib.socket(socklib.AF_UNIX, socklib.SOCK_STREAM)
    s.connect(sock)
    f = s.makefile("rwb")
    f.write(json.dumps({"op": "shutdown"}).encode() + b"\n")
    f.flush()
    assert f.readline()
    s.close()
    t.join(timeout=10)
    assert not t.is_alive()

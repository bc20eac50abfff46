"""Stream helpers: transparent gzip/plain input, '-' == stdin/stdout.

Behavioral model: the reference's IO_stream.h (reference IO_stream.h:53-136)
opens every input through gzdopen so plain and gzip files are read through the
same handle, and treats ``-`` or ``""`` as stdin/stdout. We reproduce that
contract: `open_input` sniffs the gzip magic and returns a binary file object
that yields decompressed bytes either way.
"""

from __future__ import annotations

import gzip
import io
import sys
import zlib
from typing import BinaryIO


def _is_stdio(name: str | None) -> bool:
    # reference IO_stream.h:55 uses strncmp(filename, "-", 1): any name
    # *starting* with '-' selects stdio, as does the empty string.
    return name is None or name == "" or name.startswith("-")


def open_input(name: str | None) -> BinaryIO:
    """Open a (possibly gzip) input for reading decompressed bytes."""
    if _is_stdio(name):
        raw: BinaryIO = sys.stdin.buffer
    else:
        raw = open(name, "rb")
    head = raw.read(2)
    if head == b"\x1f\x8b":
        merged = _PushbackReader(head, raw)
        return gzip.GzipFile(fileobj=merged, mode="rb")  # type: ignore[return-value]
    if raw.seekable():
        raw.seek(0)  # plain file: hand back the raw stream, no wrapper
        return raw
    return _PushbackReader(head, raw)


class _PushbackReader(io.RawIOBase):
    """Binary reader that replays sniffed magic bytes before the stream."""

    def __init__(self, head: bytes, raw: BinaryIO):
        self._head = head
        self._raw = raw

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        if self._head:
            n = min(len(b), len(self._head))
            b[:n] = self._head[:n]
            self._head = self._head[n:]
            return n
        data = self._raw.read(len(b))
        if not data:
            return 0
        b[: len(data)] = data
        return len(data)

    def close(self) -> None:
        if self._raw is not sys.stdin.buffer:
            self._raw.close()
        super().close()


def open_output(name: str | None, gz: bool = False, level: int = 6) -> BinaryIO:
    """Open a binary output; '-' or '' → stdout. gz=True wraps in gzip."""
    if _is_stdio(name):
        out: BinaryIO = sys.stdout.buffer
    else:
        out = open(name, "wb")
    if gz:
        return GzipRecordWriter(out, level=level)
    return out


def open_text_output(name: str | None):
    """Text-mode output stream for TSV/bedGraph/wig emission."""
    if _is_stdio(name):
        return sys.stdout
    return open(name, "w")


def with_suffix(outfile: str, suffix: str) -> str:
    """fcreat_outfile semantics (reference IO_stream.h:92-97): name + suffix,
    except stdio names pass through untouched."""
    if _is_stdio(outfile):
        return outfile
    return outfile + suffix


class GzipRecordWriter:
    """Buffered gzip writer matching zlib's gzdopen(..., "wb") default output
    (level 6, OS byte 3) so byte-parity with the reference gz outputs is
    achievable. Large internal buffer amortizes compression calls."""

    def __init__(self, raw: BinaryIO, level: int = 6):
        self._raw = raw
        # mtime=0 and OS=3(unix) match zlib's gzprintf container defaults.
        self._comp = zlib.compressobj(level, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        self._buf = bytearray()

    def write(self, data: bytes) -> int:
        self._buf += data
        if len(self._buf) >= 1 << 20:
            self.flush_compress()
        return len(data)

    def flush_compress(self) -> None:
        if self._buf:
            chunk = self._comp.compress(bytes(self._buf))
            if chunk:
                self._raw.write(chunk)
            self._buf.clear()

    def close(self) -> None:
        self.flush_compress()
        tail = self._comp.flush()
        if tail:
            self._raw.write(tail)
        if self._raw is not sys.stdout.buffer:
            self._raw.close()
        else:
            self._raw.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

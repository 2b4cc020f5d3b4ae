"""Interactive web UI — the reference's Streamlit page re-expressed as
a dependency-free stdlib ``http.server`` app over the same engine.

Reference surface being covered (``main/app.py``):

- "Find Occurances" tab (``main/app.py:104-124``): word input validated
  against ``^[^\\s\\n]+$`` (``main/app.py:43-44``), normalized with the
  corpus tokenizer rules, looked up → (Document, Count) table sorted
  count-descending; misses render "Word not present in corpus."
- "Upload File" tab (``main/app.py:81-102`` + ``126-152``): uploads are
  gated to ``.txt`` (the Streamlit uploader's ``type=["txt"]``,
  ``main/app.py:131``) — here extended with an explicit size cap —
  then indexed. The reference uploads to a bucket, a Cloud Function
  re-indexes, and the page POLLS result freshness (≤20 s threshold,
  ``main/app.py:15-40,139-146``); the Spark twin indexes the upload
  synchronously through ``InvertedIndexEngine.add`` (partition-level
  upsert), so "Indexing complete." is reported when the merge has
  actually committed — same UX contract, no poll needed.

The HTTP layer is deliberately thin: every behavior routes through the
same ``InvertedIndexEngine`` the CLI and tests drive, so the UI cannot
drift from the engine semantics. Single-threaded by design — a single
writer serializes index merges exactly like the reference's
single-result-file pipeline (SURVEY.md §3.2 notes the reference races
concurrent uploads; serializing is the fix, not a limitation).
"""

from __future__ import annotations

import email
import email.policy
import html
import json
import os
import re
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

from .engine import InvertedIndexEngine

DEFAULT_MAX_UPLOAD_BYTES = 16 * 1024 * 1024
ALLOWED_EXTENSIONS = (".txt",)

_PAGE = """<!doctype html>
<html><head><title>Inverted Index</title></head>
<body>
<h1>Map-Reduce Inverted Index (Spark)</h1>
<h2>Find Occurrences</h2>
<form action="/query" method="get">
  <input name="word" placeholder="Enter the word ..."/>
  <button type="submit">Find</button>
</form>
{result}
<h2>Upload File</h2>
<form action="/upload" method="post" enctype="multipart/form-data">
  <input type="file" name="file" accept=".txt"/>
  <button type="submit">Upload</button>
</form>
{message}
</body></html>
"""


class UploadRejected(ValueError):
    """Upload failed a gate (extension / empty name / bad chars)."""

    status = 400


class UploadTooLarge(UploadRejected):
    """Upload exceeded the size cap — 413, not 400 (the status rides
    the exception type, never message prose)."""

    status = 413


class IndexWebApp:
    """HTTP-free core so tests can drive the exact handler logic
    without sockets; the request handler below is a thin shim."""

    def __init__(
        self,
        spark,
        index_path: str,
        upload_dir: str,
        additive: bool = False,
        max_upload_bytes: int = DEFAULT_MAX_UPLOAD_BYTES,
        allowed_extensions: tuple[str, ...] = ALLOWED_EXTENSIONS,
    ):
        self.engine = InvertedIndexEngine(spark, index_path, additive=additive)
        self.spark = spark
        self.index_path = index_path
        self.upload_dir = upload_dir
        self.max_upload_bytes = max_upload_bytes
        self.allowed_extensions = allowed_extensions
        os.makedirs(upload_dir, exist_ok=True)

    # ---- query ------------------------------------------------------

    def query(self, word: str, top: int = 100) -> dict:
        """Validated lookup → {"rows": [(document, count), ...]} or an
        {"error"/"empty": message} mirroring the reference's UI states."""
        if not self.engine.is_valid_query(word):
            # reference main/app.py:125 warning text
            return {
                "error": "Invalid input! Please avoid spaces and newline characters."
            }
        from .operators.index import index_exists

        if not index_exists(self.spark, self.index_path):
            return {"empty": "Word not present in corpus."}
        rows = self.engine.find_occurrences(word).limit(top).collect()
        if not rows:
            return {"empty": "Word not present in corpus."}
        return {"rows": [(r["document"], int(r["count"])) for r in rows]}

    # ---- upload -----------------------------------------------------

    def upload(self, filename: str, data: bytes) -> str:
        """Gate (extension + size, reference ``main/app.py:131``'s
        ``type=["txt"]`` plus an explicit cap), save under the watch
        dir, and synchronously merge into the index."""
        name = os.path.basename(filename or "").strip()
        if not name:
            raise UploadRejected("missing filename")
        if not any(name.lower().endswith(ext) for ext in self.allowed_extensions):
            raise UploadRejected(
                f"only {'/'.join(self.allowed_extensions)} uploads are accepted"
            )
        if len(data) > self.max_upload_bytes:
            raise UploadTooLarge(
                f"file exceeds the {self.max_upload_bytes} byte upload limit"
            )
        if not re.fullmatch(r"[A-Za-z0-9._-]+", name):
            raise UploadRejected(
                "filename may contain only letters, digits, dot, dash, underscore"
            )
        path = os.path.join(self.upload_dir, name)
        with open(path, "wb") as f:
            f.write(data)
        self.engine.add(path)
        return "File uploaded successfully. Indexing complete."


def _accepts_json(accept: str | None) -> bool:
    """True when the Accept header lists ``application/json`` with a
    non-zero q — parsed per media-range, so ``application/json-seq``
    does not match and ``application/json;q=0`` is an explicit NO."""
    for part in (accept or "").split(","):
        mt, _, params = part.partition(";")
        if mt.strip().lower() != "application/json":
            continue
        q = 1.0
        for p in params.split(";"):
            k, _, v = p.partition("=")
            if k.strip().lower() == "q":
                try:
                    q = float(v.strip())
                except ValueError:
                    q = 0.0
        return q > 0
    return False


def _parse_multipart(content_type: str, body: bytes):
    """(filename, data) of the first file part of a multipart/form-data
    body — stdlib email parser, no external dependency (and no cgi
    module, which CPython removed in 3.13)."""
    msg = email.message_from_bytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body,
        policy=email.policy.HTTP,
    )
    if not msg.is_multipart():
        raise UploadRejected("expected multipart/form-data")
    for part in msg.iter_parts():
        fn = part.get_filename()
        if fn:
            return fn, part.get_payload(decode=True) or b""
    raise UploadRejected("no file part in upload")


def make_handler(app: IndexWebApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _send(self, code: int, body: str, ctype="text/html; charset=utf-8"):
            data = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                return self._send(200, _PAGE.format(result="", message=""))
            if url.path == "/query":
                word = (parse_qs(url.query).get("word") or [""])[0]
                try:
                    res = app.query(word)
                except Exception as e:  # corrupt/unreadable index → 500
                    return self._send(
                        500, f"query failed: {html.escape(str(e)[:200])}"
                    )
                if _accepts_json(self.headers.get("Accept")):
                    return self._send(200, json.dumps(res), "application/json")
                if "error" in res:
                    frag = f"<p>{html.escape(res['error'])}</p>"
                elif "empty" in res:
                    frag = f"<p>{html.escape(res['empty'])}</p>"
                else:
                    rows = "".join(
                        f"<tr><td>{html.escape(d)}</td><td>{c}</td></tr>"
                        for d, c in res["rows"]
                    )
                    frag = (
                        "<table><tr><th>Document</th><th>Count</th></tr>"
                        + rows
                        + "</table>"
                    )
                return self._send(200, _PAGE.format(result=frag, message=""))
            return self._send(404, "not found")

        def do_POST(self):
            if urlparse(self.path).path != "/upload":
                return self._send(404, "not found")
            length = int(self.headers.get("Content-Length") or 0)
            if length > app.max_upload_bytes * 2:
                return self._send(413, "upload too large")
            body = self.rfile.read(length)
            try:
                fn, data = _parse_multipart(
                    self.headers.get("Content-Type", ""), body
                )
                msg = app.upload(fn, data)
            except UploadRejected as e:
                return self._send(
                    e.status,
                    _PAGE.format(
                        result="", message=f"<p>{html.escape(str(e))}</p>"
                    ),
                )
            except Exception as e:  # engine failure → 500, not a dropped socket
                return self._send(
                    500,
                    _PAGE.format(
                        result="",
                        message=f"<p>indexing failed: {html.escape(str(e)[:200])}</p>",
                    ),
                )
            return self._send(
                200, _PAGE.format(result="", message=f"<p>{html.escape(msg)}</p>")
            )

    return Handler


def serve(app: IndexWebApp, host: str = "127.0.0.1", port: int = 8080) -> HTTPServer:
    """Bound, un-started server (callers run serve_forever / shutdown —
    the CLI runs it foreground, tests in a thread)."""
    return HTTPServer((host, port), make_handler(app))

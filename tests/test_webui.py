"""Web UI twin of the reference Streamlit page (webui.py): upload
gating (.txt only, size cap — reference main/app.py:131), synchronous
index-on-upload, query states (table / miss / invalid-input warning),
end-to-end over real HTTP."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
import uuid

import pytest

from map_reduce_using_cloud_functions_spark.webui import (
    IndexWebApp,
    UploadRejected,
    serve,
)


@pytest.fixture()
def app(spark, tmp_path):
    return IndexWebApp(
        spark,
        str(tmp_path / "index"),
        str(tmp_path / "uploads"),
        max_upload_bytes=1024,
    )


# ---- app-level (no sockets) ----------------------------------------


def test_upload_then_query_roundtrip(app):
    msg = app.upload("a.txt", b"apple banana apple")
    assert "Indexing complete" in msg
    res = app.query("Apple!")  # normalization folds to 'apple'
    assert res == {"rows": [("a.txt", 2)]}


def test_upload_merges_incrementally(app):
    app.upload("a.txt", b"apple banana")
    app.upload("b.txt", b"apple apple cherry")
    res = app.query("apple")
    assert res["rows"] == [("b.txt", 2), ("a.txt", 1)]  # count desc
    # re-upload replaces a document's postings (upsert semantics)
    app.upload("a.txt", b"cherry")
    assert app.query("apple") == {"rows": [("b.txt", 2)]}


def test_query_states(app):
    # miss before any upload and after: reference's info text
    assert app.query("nothing") == {"empty": "Word not present in corpus."}
    app.upload("a.txt", b"apple")
    assert app.query("zzz") == {"empty": "Word not present in corpus."}
    # invalid input: reference's warning text (main/app.py:43-44 regex)
    assert "error" in app.query("two words")
    assert "error" in app.query("")


def test_upload_gates(app):
    with pytest.raises(UploadRejected, match=".txt"):
        app.upload("evil.pdf", b"x")
    with pytest.raises(UploadRejected, match="limit"):
        app.upload("big.txt", b"x" * 2048)
    # path traversal is neutralized to the basename inside upload_dir
    import os

    app.upload("../escape.txt", b"safe")
    assert os.path.exists(os.path.join(app.upload_dir, "escape.txt"))
    assert not os.path.exists(os.path.join(os.path.dirname(app.upload_dir), "escape.txt"))
    with pytest.raises(UploadRejected, match="filename"):
        app.upload("sp ace.txt", b"x")
    with pytest.raises(UploadRejected, match="filename"):
        app.upload("", b"x")


# ---- HTTP end-to-end -----------------------------------------------


def _multipart(filename: str, data: bytes):
    boundary = uuid.uuid4().hex
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="file"; filename="{filename}"\r\n'
        f"Content-Type: text/plain\r\n\r\n"
    ).encode() + data + f"\r\n--{boundary}--\r\n".encode()
    return f"multipart/form-data; boundary={boundary}", body


def test_http_server_end_to_end(app):
    srv = serve(app, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        # landing page renders both forms
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "Find Occurrences" in page and "Upload File" in page
        # upload via multipart
        ctype, body = _multipart("web.txt", b"spark spark index")
        req = urllib.request.Request(
            f"{base}/upload", data=body, headers={"Content-Type": ctype}
        )
        out = urllib.request.urlopen(req).read().decode()
        assert "Indexing complete" in out
        # query as JSON
        req = urllib.request.Request(
            f"{base}/query?word=spark", headers={"Accept": "application/json"}
        )
        res = json.loads(urllib.request.urlopen(req).read())
        assert res == {"rows": [["web.txt", 2]]}
        # query as HTML table
        html_out = urllib.request.urlopen(f"{base}/query?word=index").read().decode()
        assert "<td>web.txt</td><td>1</td>" in html_out
        # gate rejection surfaces as 400
        ctype, body = _multipart("bad.exe", b"x")
        req = urllib.request.Request(
            f"{base}/upload", data=body, headers={"Content-Type": ctype}
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_upload_too_large_is_typed_413(app):
    """Status rides the exception TYPE (not message prose): rewording
    the size-cap message must not flip 413 to 400."""
    from map_reduce_using_cloud_functions_spark.webui import UploadTooLarge

    with pytest.raises(UploadTooLarge) as ei:
        app.upload("big.txt", b"x" * 2048)
    assert ei.value.status == 413
    with pytest.raises(UploadRejected) as ei:
        app.upload("evil.pdf", b"x")
    assert ei.value.status == 400


def test_json_accept_with_qvalues(app):
    """Standard clients send 'application/json, text/plain, */*' —
    membership, not equality, selects the JSON representation."""

    srv = serve(app, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        ctype, body = _multipart("q.txt", b"needle")
        req = urllib.request.Request(
            f"{base}/upload", data=body, headers={"Content-Type": ctype}
        )
        urllib.request.urlopen(req).read()
        req = urllib.request.Request(
            f"{base}/query?word=needle",
            headers={"Accept": "application/json, text/plain, */*;q=0.8"},
        )
        res = json.loads(urllib.request.urlopen(req).read())
        assert res == {"rows": [["q.txt", 1]]}
    finally:
        srv.shutdown()
        t.join(timeout=5)

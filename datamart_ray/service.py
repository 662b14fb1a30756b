"""HTTP service layer — the batch engine's API surface.

Mirrors the REFERENCE's apiserver route table (WHAT, not HOW:
apiserver/apiserver/main.py:139-153 registers /profile /search
/download/<id> /metadata/<id> /augment /upload /session/new
/session/<id> /statistics /version /health on a Tornado app backed by
Elasticsearch + Redis). Here the same surface is a dependency-free
``http.server.ThreadingHTTPServer`` over the Ray-Data-native engine:
search serves from the BM25 ``SearchEngine`` (+ the trigram index for
content grep), profile/augment run the existing Dataset pipelines,
upload is delta ingest, and sessions are an in-memory query log (the
reference's session store is Redis-backed UI state).

Design notes for scale: the service holds ONE engine handle per
process (segment readers mmap/load once); mutating endpoints
(/upload) commit through the same write-locked delta path the CLI
uses and then reopen the handle, so concurrent readers keep serving
the old committed view mid-ingest — the index swap discipline does
the heavy lifting, not the HTTP layer.
"""

from __future__ import annotations

import json
import os
import re
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _json_bytes(obj) -> bytes:
    return json.dumps(obj, default=str).encode("utf-8")


def _table_rows(t) -> list[dict]:
    if hasattr(t, "to_pylist"):
        return t.to_pylist()
    return json.loads(t.to_json(orient="records"))


class EngineService:
    """Holds the engine handles + session store behind the HTTP layer."""

    def __init__(
        self,
        index_dir: str | None = None,
        corpus: str | None = None,
        tri_index: str | None = None,
        sf_dir: str | None = None,
    ):
        self.index_dir = index_dir
        self.corpus = corpus
        self.tri_index = tri_index
        self.sf_dir = sf_dir
        self._lock = threading.Lock()
        self._engine = None
        self._tri = None
        self.sessions: dict[str, list] = {}

    # -- handles -------------------------------------------------------

    def engine(self):
        with self._lock:
            if self._engine is None:
                if not self.index_dir:
                    raise ValueError("no --index configured")
                from datamart_ray.search.engine import SearchEngine

                self._engine = SearchEngine(self.index_dir)
            return self._engine

    def tri(self):
        with self._lock:
            if self._tri is None:
                if not self.tri_index:
                    raise ValueError("no --tri-index configured")
                from datamart_ray.index.trigram import TrigramIndex

                self._tri = TrigramIndex(
                    self.tri_index, self.corpus or self.index_dir
                )
            return self._tri

    def reopen(self) -> None:
        """Drop cached handles — next request reopens the newest
        committed view (used after /upload commits a delta)."""
        with self._lock:
            self._engine = None
            self._tri = None

    # -- endpoint bodies ----------------------------------------------

    def statistics(self) -> dict:
        out: dict = {"engine": "datamart_ray"}
        if self.index_dir:
            e = self.engine()
            out["bm25"] = {
                "n_docs": e.n_docs,
                "avgdl": round(e.avgdl, 3),
                "n_segments": len(e.readers),
            }
        if self.tri_index:
            t = self.tri()
            out["trigram"] = {
                "n_segments": len(t.manifest["segments"]),
                "version": t.manifest.get("version", 0),
                "tombstones": int(t.tombstones.size),
            }
        return out

    def search(self, body: dict) -> list[dict]:
        e = self.engine()
        kind = body.get("kind", "match")
        q = body["query"]
        k = int(body.get("k", 10))
        if kind == "phrase":
            t = e.phrase_search(q, k=k)
        elif kind == "fuzzy":
            t = e.fuzzy_search(q, k=k)
        else:
            t = e.search(
                q,
                k=k,
                mode=body.get("mode", "and"),
                filters=body.get("filters"),
            )
        return _table_rows(t)

    def grep(self, body: dict) -> list[dict]:
        t = self.tri()
        kw = dict(
            ignore_case=bool(body.get("ignore_case")),
            filters=body.get("filters"),
        )
        if body.get("lines"):
            out = t.grep(
                body["pattern"], regex=bool(body.get("regex")), **kw
            )
        elif body.get("regex"):
            out = t.regexp_search(body["pattern"], **kw)
        else:
            out = t.substring_search(body["pattern"], **kw)
        return _table_rows(out)

    def _deleted(self, doc_id: int) -> bool:
        """Tombstoned docs 404 from GET-by-id exactly as they vanish
        from /search and /grep (the ES get-after-delete contract)."""
        import numpy as np

        if self.index_dir:
            for r in self.engine().readers:
                t = getattr(r, "_tombstones", None)
                if t is not None and t.size:
                    i = int(np.searchsorted(t, doc_id))
                    if i < t.size and int(t[i]) == doc_id:
                        return True
        if self.tri_index:
            t = self.tri().tombstones
            i = int(np.searchsorted(t, doc_id))
            if i < t.size and int(t[i]) == doc_id:
                return True
        return False

    def metadata(self, doc_id: int) -> dict:
        e = self.engine()
        if self._deleted(doc_id):
            raise KeyError(f"doc {doc_id} not found")
        for r in e.readers:
            import numpy as np

            i = int(np.searchsorted(r._doc_ids, doc_id))
            if i < r._doc_ids.size and int(r._doc_ids[i]) == doc_id:
                row = {
                    c: r._meta[c][i].as_py()
                    for c in r._meta.column_names
                }
                return row
        raise KeyError(f"doc {doc_id} not found")

    def download(self, doc_id: int) -> dict:
        """The doc's source row (content included) — the reference's
        /download/<id> returns the stored dataset."""
        if not self.corpus:
            raise ValueError("no --corpus configured")
        if self._deleted(doc_id):
            raise KeyError(f"doc {doc_id} not found")
        import numpy as np
        import pyarrow.parquet as pq

        from datamart_ray.index.build import _expand_paths

        base = 0
        for path in _expand_paths(self.corpus):
            pf = pq.ParquetFile(path)
            n = pf.metadata.num_rows
            if base <= doc_id < base + n:
                off = doc_id - base
                rg_base = 0
                for rg in range(pf.metadata.num_row_groups):
                    rn = pf.metadata.row_group(rg).num_rows
                    if rg_base <= off < rg_base + rn:
                        t = pf.read_row_group(rg)
                        return {
                            c: t[c][off - rg_base].as_py()
                            for c in t.column_names
                        }
                    rg_base += rn
            base += n
        raise KeyError(f"doc {doc_id} not found")

    def profile(self, body: dict) -> list[dict]:
        from datamart_ray.pipelines.profiler import profile_table

        sf = body.get("sf_dir") or self.sf_dir
        if not sf:
            raise ValueError("profile needs sf_dir")
        return _table_rows(
            profile_table(sf, body.get("table", "lineitem"))
        )

    def augment(self, body: dict) -> list[dict]:
        from datamart_ray.pipelines.augment import (
            ag_join_orders_lineitem,
            ag_union_customer_supplier,
        )

        sf = body.get("sf_dir") or self.sf_dir
        if not sf:
            raise ValueError("augment needs sf_dir")
        fn = (
            ag_join_orders_lineitem
            if body.get("task", "join") == "join"
            else ag_union_customer_supplier
        )
        return _table_rows(fn(sf).head(int(body.get("limit", 20))))

    def upload(self, body: dict) -> dict:
        """Delta-ingest new parquet into the configured indexes (the
        reference's /upload adds a dataset to the system). Readers keep
        serving the old committed view until the reopen."""
        path = body["path"]
        out: dict = {}
        if self.index_dir:
            from datamart_ray.index.maintain import ingest_delta

            out["bm25"] = ingest_delta(self.index_dir, path)
        if self.tri_index:
            from datamart_ray.index.trigram import trigram_ingest_delta

            man = trigram_ingest_delta(self.tri_index, path)
            out["trigram"] = {
                "n_segments": man["n_segments"],
                "version": man.get("version", 0),
            }
        self.reopen()
        return out


def _make_handler(svc: EngineService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj) -> None:
            body = _json_bytes(obj)
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):
            try:
                if self.path == "/health":
                    return self._send(200, {"status": "ok"})
                if self.path == "/version":
                    import ray

                    return self._send(
                        200,
                        {
                            "engine": "datamart_ray",
                            "ray": ray.__version__,
                        },
                    )
                if self.path == "/statistics":
                    return self._send(200, svc.statistics())
                m = re.fullmatch(r"/metadata/(\d+)", self.path)
                if m:
                    return self._send(
                        200, svc.metadata(int(m.group(1)))
                    )
                m = re.fullmatch(r"/download/(\d+)", self.path)
                if m:
                    return self._send(
                        200, svc.download(int(m.group(1)))
                    )
                m = re.fullmatch(r"/session/([\w-]+)", self.path)
                if m:
                    sid = m.group(1)
                    if sid not in svc.sessions:
                        return self._send(
                            404, {"error": "no such session"}
                        )
                    return self._send(
                        200, {"id": sid, "queries": svc.sessions[sid]}
                    )
                return self._send(404, {"error": "not found"})
            except KeyError as e:
                return self._send(404, {"error": str(e)})
            except Exception as e:  # surfaced, never a hung socket
                return self._send(500, {"error": str(e)})

        def do_POST(self):
            try:
                body = self._body()
                if self.path == "/search":
                    rows = svc.search(body)
                    sid = body.get("session")
                    if sid in svc.sessions:
                        svc.sessions[sid].append(
                            {"query": body["query"], "n": len(rows)}
                        )
                    return self._send(200, {"results": rows})
                if self.path == "/grep":
                    return self._send(
                        200, {"results": svc.grep(body)}
                    )
                if self.path == "/profile":
                    return self._send(
                        200, {"columns": svc.profile(body)}
                    )
                if self.path == "/augment":
                    return self._send(
                        200, {"rows": svc.augment(body)}
                    )
                if self.path == "/upload":
                    return self._send(200, svc.upload(body))
                if self.path == "/session/new":
                    sid = uuid.uuid4().hex[:12]
                    svc.sessions[sid] = []
                    return self._send(200, {"id": sid})
                return self._send(404, {"error": "not found"})
            except (KeyError, ValueError) as e:
                return self._send(400, {"error": str(e)})
            except Exception as e:
                return self._send(500, {"error": str(e)})

    return Handler


def create_server(
    index_dir: str | None = None,
    corpus: str | None = None,
    tri_index: str | None = None,
    sf_dir: str | None = None,
    port: int = 0,
) -> tuple[ThreadingHTTPServer, int]:
    """Bind the service on localhost:``port`` (0 → ephemeral). The
    caller owns the server lifecycle (serve_forever / shutdown)."""
    svc = EngineService(index_dir, corpus, tri_index, sf_dir)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", port), _make_handler(svc)
    )
    return httpd, httpd.server_address[1]


def serve(
    index_dir: str | None,
    corpus: str | None,
    tri_index: str | None,
    sf_dir: str | None,
    port: int,
) -> None:  # pragma: no cover - interactive entry
    httpd, p = create_server(index_dir, corpus, tri_index, sf_dir, port)
    print(json.dumps({"serving": f"http://127.0.0.1:{p}"}), flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()

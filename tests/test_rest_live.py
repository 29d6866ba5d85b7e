"""Live-HTTP ingest end-to-end against a loopback stub server — the
analogue of the reference's real-network smoke (``/root/reference/
test.py:9-15``), which authenticates, pages, and parses against a live
endpoint. The sandbox has no external network, so the stub binds
127.0.0.1:0 and serves the same envelope shapes the reference consumes;
everything downstream of the socket (auth param, pagination loop,
throttle, landing layout, schema'd Spark read) is the real code path.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

requests = pytest.importorskip("requests")

from movie_data_etl_pipeline_spark.sources import rest


class _StubTmdb(BaseHTTPRequestHandler):
    """Paginated /movie/popular plus /genre/movie/list; every route
    requires api_key (401 otherwise) and unknown routes 404 — the two
    failure modes ``http_get_json`` must surface."""

    def do_GET(self):  # noqa: N802 (stdlib casing)
        u = urlparse(self.path)
        q = parse_qs(u.query)
        if q.get("api_key") != ["k-test"]:
            return self._send(401, {"status_message": "Invalid API key"})
        if u.path == "/movie/popular":
            page = int(q.get("page", ["1"])[0])
            return self._send(
                200,
                {
                    "page": page,
                    "total_pages": 3,
                    "total_results": 6,
                    "results": [
                        {
                            "id": page * 100 + i,
                            "title": f"Movie {page}-{i}",
                            "release_date": "2024-01-0%d" % (i + 1),
                            "vote_average": 7.5,
                            "original_language": "en",
                            "genre_ids": [18, 35],
                        }
                        for i in range(2)
                    ],
                },
            )
        if u.path == "/genre/movie/list":
            return self._send(
                200, {"genres": [{"id": 18, "name": "Drama"}, {"id": 35, "name": "Comedy"}]}
            )
        return self._send(404, {"status_message": "not found"})

    def _send(self, code: int, doc: dict) -> None:
        body = json.dumps(doc).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture()
def stub_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubTmdb)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_get_json_auth_and_errors(stub_server):
    doc = rest.http_get_json("/genre/movie/list", "k-test", base_url=stub_server)
    assert [g["name"] for g in doc["genres"]] == ["Drama", "Comedy"]
    with pytest.raises(requests.HTTPError):  # bad key -> 401 raises
        rest.http_get_json("/genre/movie/list", "WRONG", base_url=stub_server)
    with pytest.raises(requests.HTTPError):  # unknown route -> 404 raises
        rest.http_get_json("/nope", "k-test", base_url=stub_server)


def test_fetch_land_read_end_to_end(spark, tmp_path, stub_server):
    """The full S1-S4 pipeline live: authenticated paged fetch with the
    politeness throttle, one landed JSON file per page, then a
    schema'd Spark read + flatten of the landed envelopes."""
    files = rest.fetch_and_land_pages(
        str(tmp_path), "k-test", pages=3, sleep_s=0.0, base_url=stub_server
    )
    assert len(files) == 3
    env = rest.read_page_envelopes(spark, str(tmp_path))
    assert env.count() == 3  # one row per landed page
    from pyspark.sql import functions as F

    movies = env.select(F.explode("results").alias("m")).select("m.id", "m.title")
    got = sorted(r["id"] for r in movies.collect())
    assert got == [100, 101, 200, 201, 300, 301]

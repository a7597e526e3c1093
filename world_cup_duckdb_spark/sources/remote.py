"""Remote file fetch with a local content cache (OP01).

Reference: the build downloads each jfjelstul/worldcup CSV over HTTPS into
`data/raw/` and skips the download when the file is already present
(scripts/build_db.py:33-52) — fetch-if-absent, keyed by file name.

Engine counterpart: a driver-side fetch-through-cache keyed by the URL's
md5 (so distinct URLs with equal basenames never collide), with an
atomic tmp-file → rename publish so a crashed download can never be
mistaken for a cached file. Reads go through `spark.read` on the cached
local copy.

Scale posture: this operator is for OUT-OF-BAND sources — metadata files,
reference tables, config CSVs fetched over plain HTTP(S) — which are
small and driver-side by nature. Bulk data at 100 TB never goes through
a driver-side fetch: object-store URIs (s3://, hdfs://, abfs://) are
read directly by `spark.read.csv/parquet(uri)` with distributed range
reads, and THAT path needs no cache layer because the store is the
cache. A fleet of many small URLs can be fetched in parallel by mapping
`fetch_cached` over a partitioned URL list with `mapInPandas` writing to
shared storage; the cache key scheme is already collision-safe for that.
"""

from __future__ import annotations

import hashlib
import os
import urllib.parse
import urllib.request
import uuid


def fetch_cached(url: str, cache_dir: str) -> tuple[str, bool]:
    """Fetch ``url`` into ``cache_dir`` unless already cached.

    Returns ``(local_path, was_cache_hit)``. The cache key is
    ``md5(url)[:16]-basename``: content-addressed by URL so re-fetches of
    the same URL are free (the reference's fetch-if-absent behavior) and
    different URLs can never collide on basename. Downloads land in a
    per-call unique temp file (two concurrent fetches of the same URL
    must not interleave writes into one temp path) and are published by
    atomic rename — readers never see a partial file, and concurrent
    publishers of the same URL each rename a complete copy (last one
    wins, both complete). Supports any urllib scheme (``file://`` in
    the sandboxed tests, ``http(s)://`` in real use).
    """
    os.makedirs(cache_dir, exist_ok=True)
    key = hashlib.md5(url.encode("utf-8")).hexdigest()[:16]
    base = os.path.basename(urllib.parse.urlparse(url).path) or "payload"
    dest = os.path.join(cache_dir, f"{key}-{base}")
    if os.path.exists(dest):
        return dest, True
    tmp = f"{dest}.part-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return dest, False

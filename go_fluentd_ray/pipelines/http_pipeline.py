"""Second end-to-end pipeline: HTTP signed-JSON ingest -> enrich ->
route -> per-sink counts, composed from the same stage library as the
flagship (demonstrating the §2.8 reuse surface over a different
source). Mirrors the reference's HTTPRecv -> acceptor -> postfilter ->
producer path for its JSON endpoint (recvs/http.go + settings).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.receivers import DEFAULT_WINDOW, http_validate_batch
from ..stages.acceptor import _lookup

HTTP_SINK_MAP = {"http.sit": "sit-http-logs"}


def _enrich_batch(batch: pa.Table) -> pa.Table:
    """location = '${lat},${lon}' (FieldsFilter new_fields semantics,
    settings.yml:690-692) with explicit %.5f formatting so the DuckDB
    printf oracle agrees on float rendering; datasource literal."""
    lat = pd.Series(batch["lat"].to_numpy(zero_copy_only=False))
    lon = pd.Series(batch["lon"].to_numpy(zero_copy_only=False))
    loc = lat.map("{:.5f}".format) + "," + lon.map("{:.5f}".format)
    n = batch.num_rows
    batch = batch.append_column("location", pa.Array.from_pandas(loc))
    return batch.append_column("datasource",
                               pa.array(["http"] * n, type=pa.string()))


def build(ds) -> "object":
    ds = ds.map_batches(http_validate_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(_enrich_batch, batch_format="pyarrow",
                        zero_copy_batch=True)

    def route(batch: pa.Table) -> pa.Table:
        sink = _lookup(batch["tag"], HTTP_SINK_MAP)
        batch = batch.append_column("sink", sink)
        return batch.filter(pc.is_valid(batch["sink"]))

    return ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)


def sql(corpus_glob: str, salt: str) -> str:
    return rf"""
SELECT rec_id, msg, timestamp, sig, lat, lon,
       tag AS orig_tag, 'http.sit' AS tag,
       printf('%.5f', lat) || ',' || printf('%.5f', lon) AS location,
       'http' AS datasource, 'sit-http-logs' AS sink
FROM read_json_auto('{corpus_glob}')
WHERE regexp_matches(timestamp, '^\d{{4}}-\d{{2}}-\d{{2}}T\d{{2}}:\d{{2}}:\d{{2}}$')
  AND sig = md5(timestamp || '{salt}')
  AND try_strptime(timestamp, '%Y-%m-%dT%H:%M:%S')
      BETWEEN TIMESTAMP '{DEFAULT_WINDOW[0].replace("T", " ")}'
          AND TIMESTAMP '{DEFAULT_WINDOW[1].replace("T", " ")}'
"""

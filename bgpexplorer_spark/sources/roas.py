"""ROA table loaders — the public RPKI validator export formats, parsed
into the ``(net, plen, max_len, asn)`` / ``(net6, ...)`` tables
:func:`analytics.rpki_validate` / ``rpki_validate_v6`` consume.

Two interchange shapes every deployed validator emits:

- JSON (RIPE NCC validator / rpki-client ``-j``): ``{"roas": [{"asn":
  "AS13335", "prefix": "1.0.0.0/24", "maxLength": 24, "ta": "apnic"},
  ...]}`` — ``asn`` may be ``"AS123"`` or a bare number, ``maxLength``
  may be absent (defaults to the prefix length per RFC 6482 §3.3).
- CSV (routinator ``vrps``): header ``ASN,IP Prefix,Max Length,Trust
  Anchor`` with the same value conventions.

A validator export is a single driver-sized file (the global VRP set is
~500k rows, a few tens of MB), so parsing is driver-side and the result
is a broadcastable dimension — the same posture as the reference's
whois.json server map. Malformed rows are skipped with a count, never
fatal (a monitoring daemon must survive a truncated export).
"""

from __future__ import annotations

import ipaddress
import warnings

from pyspark.sql import DataFrame, SparkSession

V4_ROA_SCHEMA = "net long, plen int, max_len int, asn long, ta string"
V6_ROA_SCHEMA = "net binary, plen int, max_len int, asn long, ta string"


def _parse_asn(raw) -> int | None:
    if isinstance(raw, int):
        return raw if 0 <= raw < 2**32 else None
    s = str(raw).strip().upper()
    if s.startswith("AS"):
        s = s[2:]
    return int(s) if s.isdigit() and int(s) < 2**32 else None


def _roa_row(asn_raw, prefix_raw, maxlen_raw, ta) -> tuple | None:
    """One VRP → (is_v6, net, plen, max_len, asn, ta); None = skip."""
    asn = _parse_asn(asn_raw)
    if asn is None:
        return None
    try:
        net = ipaddress.ip_network(str(prefix_raw).strip(), strict=False)
    except ValueError:
        return None
    plen = net.prefixlen
    try:
        max_len = int(maxlen_raw) if maxlen_raw not in (None, "") else plen
    except (TypeError, ValueError):
        return None
    # RFC 6482 §3.3: maxLength must be >= the prefix length and within
    # the family's address width
    width = 128 if net.version == 6 else 32
    if not plen <= max_len <= width:
        return None
    ta = str(ta) if ta is not None else None  # one bad field ≠ fatal load
    if net.version == 6:
        return (True, net.network_address.packed, plen, max_len, asn, ta)
    return (False, int(net.network_address), plen, max_len, asn, ta)


def _to_frames(
    spark: SparkSession, rows: list, n_skipped: int, source: str
) -> tuple[DataFrame, DataFrame]:
    if n_skipped:
        warnings.warn(
            f"{source}: skipped {n_skipped} malformed ROA rows", stacklevel=3
        )
    v4 = [r[1:] for r in rows if not r[0]]
    v6 = [r[1:] for r in rows if r[0]]
    return (
        spark.createDataFrame(v4, V4_ROA_SCHEMA),
        spark.createDataFrame(v6, V6_ROA_SCHEMA),
    )


def load_roas_json(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """RIPE/rpki-client JSON export → (v4 ROA table, v6 ROA table)."""
    import json

    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    entries = doc.get("roas", doc) if isinstance(doc, dict) else doc
    if not isinstance(entries, list):
        raise ValueError(f"{path}: expected a 'roas' list")
    rows, n_skipped = [], 0
    for e in entries:
        if not isinstance(e, dict):
            n_skipped += 1
            continue
        row = _roa_row(
            e.get("asn"), e.get("prefix"), e.get("maxLength"), e.get("ta")
        )
        if row is None:
            n_skipped += 1
        else:
            rows.append(row)
    return _to_frames(spark, rows, n_skipped, path)


def load_roas_csv(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """routinator ``vrps`` CSV export → (v4 ROA table, v6 ROA table)."""
    import csv

    rows, n_skipped = [], 0
    with open(path, encoding="utf-8", newline="") as f:
        reader = csv.reader(f)
        header = next(reader, None)
        if header is None:
            raise ValueError(f"{path}: empty CSV")
        cols = {c.strip().lower(): i for i, c in enumerate(header)}
        try:
            i_asn = cols["asn"]
            i_pfx = cols["ip prefix"]
            i_max = cols.get("max length")
            i_ta = cols.get("trust anchor")
        except KeyError as e:
            raise ValueError(f"{path}: missing CSV column {e}") from e
        for rec in reader:
            if not rec or len(rec) <= max(i_asn, i_pfx):
                n_skipped += 1
                continue
            row = _roa_row(
                rec[i_asn],
                rec[i_pfx],
                rec[i_max] if i_max is not None and len(rec) > i_max else None,
                rec[i_ta].strip() if i_ta is not None and len(rec) > i_ta else None,
            )
            if row is None:
                n_skipped += 1
            else:
                rows.append(row)
    return _to_frames(spark, rows, n_skipped, path)

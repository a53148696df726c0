"""ipinfo-equivalent CLI — reference S12 (bin/ipinfo.py:342-565).

Point lookups use a plain-Python binary search over the sorted range
dims (the reference's own O(log m) structure, ipinfo.py:207,217-238) —
no JVM spin-up for a single-IP query. The Spark engine uses the same
CSVs through `sources.dims` + the broadcast range join; this CLI is the
interactive sibling, byte-matching the reference's JSON output shapes:

    {"ip": ..., "country_code": ..., "asn": ..., "aso": ...}
    {"ip": ..., "error": "Invalid IP address format."}
    {"ip": ..., "error": "Information not found."}

``--update`` refreshes both dims via `sources.dims.refresh_dim`
(atomic replace, gz-transparent).
"""

from __future__ import annotations

import argparse
import csv
import ipaddress
import json
import sys
from bisect import bisect_right


def ip_to_int(s: str) -> int | None:
    try:
        return int(ipaddress.ip_address(s.strip()))
    except ValueError:
        return None


def load_ranges(path: str, n_payload: int) -> list[tuple[int, int, list[str]]]:
    """CSV → sorted [(start, end, payload...)]; header and malformed
    rows skipped (reference ipinfo.py:129-214 semantics)."""
    out: list[tuple[int, int, list[str]]] = []
    try:
        with open(path, encoding="utf-8") as f:
            reader = csv.reader(f)
            next(reader, None)  # header (reference always skips row 1)
            for row in reader:
                if len(row) < 2 + n_payload:
                    continue
                try:
                    start, end = int(row[0].strip()), int(row[1].strip())
                except ValueError:
                    continue
                out.append((start, end, [c.strip() for c in row[2 : 2 + n_payload]]))
    except OSError:
        return []
    out.sort(key=lambda r: r[0])
    return out


def search(ranges: list[tuple[int, int, list[str]]], ip_int: int) -> list[str] | None:
    """Binary search over non-overlapping sorted ranges (reference
    ipinfo.py:217-238)."""
    i = bisect_right(ranges, ip_int, key=lambda r: r[0]) - 1
    if i >= 0 and ranges[i][0] <= ip_int <= ranges[i][1]:
        return ranges[i][2]
    return None


def lookup(ip: str, country_path: str, asn_path: str) -> dict:
    ip_int = ip_to_int(ip)
    if ip_int is None:
        return {"ip": ip, "error": "Invalid IP address format."}
    c = search(load_ranges(country_path, 1), ip_int)
    a = search(load_ranges(asn_path, 2), ip_int)
    return {
        "ip": ip,
        "country_code": c[0] if c and c[0] else "N/A",
        "asn": a[0] if a and a[0] else "N/A",
        "aso": a[1] if a and a[1] else "N/A",
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="mls-ipinfo", description="IP information lookup/update"
    )
    p.add_argument("ip_address", nargs="?", help="IP address to look up")
    p.add_argument("--country-db-path", default="country_ranges.csv")
    p.add_argument("--asn-db-path", default="asn_ranges.csv")
    p.add_argument("--update", action="store_true", help="refresh both dims")
    p.add_argument("--country-db-url")
    p.add_argument("--asn-db-url")
    args = p.parse_args(argv)

    if args.update:
        from .sources.dims import refresh_dim

        ok = True
        if args.country_db_url:
            ok &= refresh_dim(args.country_db_url, args.country_db_path)
        if args.asn_db_url:
            ok &= refresh_dim(args.asn_db_url, args.asn_db_path)
        if not ok:
            return 1

    if args.ip_address:
        print(json.dumps(lookup(args.ip_address, args.country_db_path, args.asn_db_path)))
    elif not args.update:
        p.print_help()
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())

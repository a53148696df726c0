"""S7 dim refresh (atomic, gz-transparent, file:// for tests) and the
S12 ipinfo CLI (bisect lookup, reference JSON shapes)."""

import gzip
import json

from maillogsentinel_spark.cli import lookup, main
from maillogsentinel_spark.sources.dims import refresh_dim

COUNTRY = "start,end,cc\n16777216,16777471,US\n754974720,771751935,FR\nbadrow\n"
ASN = "start,end,asn,aso\n754974720,771751935,64500,Example ASO\n"


def _write_dims(tmp_path):
    c = tmp_path / "country.csv"
    a = tmp_path / "asn.csv"
    c.write_text(COUNTRY)
    a.write_text(ASN)
    return str(c), str(a)


def test_refresh_dim_plain_and_gz(tmp_path):
    src = tmp_path / "src.csv"
    src.write_text(COUNTRY)
    dest = tmp_path / "dest.csv"
    assert refresh_dim(src.as_uri(), str(dest))
    assert dest.read_text() == COUNTRY

    gz = tmp_path / "src.csv.gz"
    gz.write_bytes(gzip.compress(ASN.encode()))
    dest2 = tmp_path / "dest2.csv"
    assert refresh_dim(gz.as_uri(), str(dest2))
    assert dest2.read_text() == ASN


def test_refresh_dim_failure_keeps_old_file(tmp_path):
    dest = tmp_path / "dest.csv"
    dest.write_text("old content")
    missing = (tmp_path / "nope.csv").as_uri()
    assert refresh_dim(missing, str(dest)) is False
    assert dest.read_text() == "old content"
    # no temp litter
    assert [p.name for p in tmp_path.iterdir()] == ["dest.csv"]


def test_lookup_hit_miss_invalid(tmp_path):
    c, a = _write_dims(tmp_path)
    hit = lookup("45.1.2.3", c, a)
    assert hit == {"ip": "45.1.2.3", "country_code": "FR",
                   "asn": "64500", "aso": "Example ASO"}
    # in country range only -> ASN side defaults independently (J3)
    partial = lookup("1.0.0.5", c, a)
    assert partial["country_code"] == "US" and partial["asn"] == "N/A"
    miss = lookup("200.0.0.1", c, a)
    assert (miss["country_code"], miss["asn"], miss["aso"]) == ("N/A",) * 3
    bad = lookup("not-an-ip", c, a)
    assert bad == {"ip": "not-an-ip", "error": "Invalid IP address format."}


def test_cli_main_prints_json(tmp_path, capsys):
    c, a = _write_dims(tmp_path)
    rc = main(["45.1.2.9", "--country-db-path", c, "--asn-db-path", a])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["country_code"] == "FR"


def test_cli_update_then_lookup(tmp_path, capsys):
    src_c = tmp_path / "remote_c.csv"
    src_c.write_text(COUNTRY)
    src_a = tmp_path / "remote_a.csv.gz"
    src_a.write_bytes(gzip.compress(ASN.encode()))
    c = str(tmp_path / "local_c.csv")
    a = str(tmp_path / "local_a.csv")
    rc = main([
        "--update",
        "--country-db-url", src_c.as_uri(), "--country-db-path", c,
        "--asn-db-url", src_a.as_uri(), "--asn-db-path", a,
        "45.1.2.3",
    ])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["aso"] == "Example ASO"

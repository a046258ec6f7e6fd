#!/usr/bin/env python3
"""Generate the committed GeoPackage fixture for the Gpkg reader spec.

fixtures/poi.gpkg: a minimal standards-shaped GeoPackage (gpkg_contents +
gpkg_geometry_columns + one 'poi' feature layer of XY points with GPB
geometry blobs) written via the stdlib sqlite3 module — enough rows spread
over multiple pages to exercise interior b-tree traversal.
"""
import os, sqlite3, struct


def gpb_point(lon: float, lat: float, srs_id: int = 4326) -> bytes:
    # magic GP, version 0, flags: envelope indicator 1 (XY), little-endian (bit0)
    header = b"GP" + bytes([0, (1 << 1) | 1]) + struct.pack("<i", srs_id)
    envelope = struct.pack("<4d", lon, lon, lat, lat)
    wkb = struct.pack("<BIdd", 1, 1, lon, lat)  # little-endian, Point, x, y
    return header + envelope + wkb


def main():
    os.makedirs("fixtures", exist_ok=True)
    path = "fixtures/poi.gpkg"
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("PRAGMA page_size = 1024")  # small pages -> multi-page b-tree
    cur.execute("""CREATE TABLE gpkg_spatial_ref_sys (
        srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
        organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
        definition TEXT NOT NULL, description TEXT)""")
    cur.execute("INSERT INTO gpkg_spatial_ref_sys VALUES "
                "('WGS 84', 4326, 'EPSG', 4326, 'GEOGCS[...]', NULL)")
    cur.execute("""CREATE TABLE gpkg_contents (
        table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
        identifier TEXT UNIQUE, description TEXT DEFAULT '',
        last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
        max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""")
    cur.execute("""CREATE TABLE gpkg_geometry_columns (
        table_name TEXT NOT NULL, column_name TEXT NOT NULL,
        geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
        z TINYINT NOT NULL, m TINYINT NOT NULL)""")
    cur.execute("""CREATE TABLE poi (
        fid INTEGER PRIMARY KEY, name TEXT, category TEXT,
        score REAL, geom POINT)""")
    cur.execute("INSERT INTO gpkg_geometry_columns VALUES "
                "('poi', 'geom', 'POINT', 4326, 0, 0)")

    n = 200  # enough 1 KiB pages to force an interior b-tree level
    cats = ["hospital", "school", "park", "cafe"]
    for i in range(1, n + 1):
        lon = -74.3 + (i % 60) * 0.01
        lat = 40.5 + (i % 50) * 0.01
        cur.execute("INSERT INTO poi VALUES (?, ?, ?, ?, ?)",
                    (i, f"poi_{i:03d}", cats[i % 4], round(i * 0.25, 2),
                     gpb_point(lon, lat)))
    cur.execute("INSERT INTO gpkg_contents VALUES "
                "('poi', 'features', 'poi', '', NULL, -74.3, 40.5, -73.71, 40.99, 4326)")
    con.commit()
    # Flatten any WAL/journal state into the main file
    cur.execute("PRAGMA journal_mode = DELETE")
    con.commit()
    con.close()
    print(f"wrote {path} ({os.path.getsize(path)} bytes, {n} features)")

    # Edge fixture: negative and >= 2^56 rowids force 9-byte SQLite varints
    # (the 9th byte carries all 8 bits) — the encoding a naive 8-byte varint
    # reader silently corrupts.
    epath = "fixtures/edge.gpkg"
    if os.path.exists(epath):
        os.remove(epath)
    con = sqlite3.connect(epath)
    cur = con.cursor()
    cur.execute("""CREATE TABLE gpkg_contents (
        table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
        identifier TEXT UNIQUE, description TEXT DEFAULT '',
        last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
        max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""")
    cur.execute("CREATE TABLE pts (fid INTEGER PRIMARY KEY, name TEXT, geom POINT)")
    for fid, name, lon, lat in [(-1, "neg", -74.0, 40.7),
                                (2 ** 57, "huge", -73.9, 40.8),
                                (7, "plain", -74.1, 40.6)]:
        cur.execute("INSERT INTO pts VALUES (?, ?, ?)",
                    (fid, name, gpb_point(lon, lat)))
    cur.execute("INSERT INTO gpkg_contents VALUES "
                "('pts', 'features', 'pts', '', NULL, -74.1, 40.6, -73.9, 40.8, 4326)")
    # Keyword-prefixed COLUMN names ('checkin', 'uniqueness', 'checksum')
    # plus real table-level UNIQUE/CHECK constraints: the reader's
    # constraint-clause filter must drop the clauses and keep the columns.
    cur.execute("""CREATE TABLE kw (
        fid INTEGER PRIMARY KEY, checkin INTEGER, uniqueness TEXT,
        checksum REAL, geom POINT,
        UNIQUE (checkin), CHECK (checksum >= 0))""")
    for fid, ci, u, cs, lon, lat in [(1, 11, "u1", 0.5, -74.0, 40.7),
                                     (2, 22, "u2", 1.5, -73.9, 40.8)]:
        cur.execute("INSERT INTO kw VALUES (?, ?, ?, ?, ?)",
                    (fid, ci, u, cs, gpb_point(lon, lat)))
    cur.execute("INSERT INTO gpkg_contents VALUES "
                "('kw', 'features', 'kw', '', NULL, -74.0, 40.7, -73.9, 40.8, 4326)")
    con.commit()
    cur.execute("PRAGMA journal_mode = DELETE")
    con.commit()
    con.close()
    print(f"wrote {epath} ({os.path.getsize(epath)} bytes)")


if __name__ == "__main__":
    main()

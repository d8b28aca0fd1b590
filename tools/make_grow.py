#!/usr/bin/env python3
"""Build a GENUINELY GROWN corpus for scale benching (dev tool,
driver-side only — never a library dependency).

make_scale10.py replicates rows verbatim: distinct CONTENT does not
grow, so distinct-content-factored operators measure replication
invariance, not scaling. This tool grows distinct content ~factor x
while preserving each replica's INTERNAL duplication statistics and
destroying CROSS-replica relations:

  - documents: replica i applies a cyclic letter substitution (rot-i
    over a-z/A-Z) to the whole text plus a tiny replica marker. A
    per-replica bijection preserves exact-duplicate groups and shared
    shingles WITHIN the replica (the same near-dup structure as the
    base corpus) while sharing no shingles across replicas;
  - embeddings: replica i rotates the component vector by i positions —
    norms and within-replica dot products are exactly preserved, while
    cross-replica cosines scatter like unrelated vectors.

Usage:
    python3 tools/make_grow.py /root/testdata/sf0.01 /tmp/sfgrow10 10
"""
import string
import sys

import duckdb


def main(src: str, dst: str, factor: int) -> None:
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT * FROM range({factor}) t(i)")

    def keyspan(table: str, col: str) -> int:
        return con.execute(
            f"SELECT max({col}) + 1 FROM '{src}/{table}.parquet'"
        ).fetchone()[0]

    D = keyspan("documents", "doc_id")
    V = keyspan("embeddings", "vec_id")

    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    rots = [
        (lower[i:] + lower[:i]) + (upper[i:] + upper[:i])
        for i in range(factor)
    ]
    rot_case = " ".join(
        f"WHEN i = {i} THEN translate(text, '{lower + upper}', '{rots[i]}')"
        for i in range(factor)
    )

    # Edge docs appended past the grown id range: EMPTY and 1-byte
    # texts at THIRTY-TWO consecutive ids each — the media routing is
    # doc_id % 8 (WAV/PNG/gray-JPEG/BMP at % 4, and the JPEG class
    # splits % 8 into gray vs COLOR), and the QUARANTINE edge classes
    # are doc_id % 32 (Multimodal.assetsWithEdgeCases truncates
    # residues {4,9,18,27} mid-header and swaps 26 for a hostile-dims
    # oversize JPEG), so 32 ids per text guarantee every container
    # variant AND every corrupt/oversized class sees the zero-/one-byte
    # payload — plus the 64-char grid boundary (w wraps to 1). These
    # exist so the degenerate-content paths (height clamps, empty
    # checksum regions, zero-selection winnows, truncated-container
    # rejects) OCCUR in a tested corpus instead of staying latent.
    edge_texts = ["", "a", "x" * 63, "y" * 64, "z" * 65]
    edge_rows = ", ".join(
        f"({j}, '{t}')"
        for j, t in enumerate(
            t for t in edge_texts for _ in range(32)
        )
    )
    con.execute(
        f"""COPY (
          SELECT doc_id + i*{D} AS doc_id,
                 (CASE {rot_case} END) || ' ~r' || i AS text,
                 lang, source,
                 n_chars + 3 + length(CAST(i AS VARCHAR)) AS n_chars
          FROM '{src}/documents.parquet', reps
          UNION ALL
          SELECT {factor * D} + j AS doc_id, text,
                 'en' AS lang, 'edge' AS source,
                 length(text) AS n_chars
          FROM (VALUES {edge_rows}) edge(j, text)
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)"""
    )
    con.execute(
        f"""COPY (
          SELECT vec_id + i*{V} AS vec_id,
                 list_concat(embedding[i + 1:], embedding[1:i]) AS embedding,
                 label
          FROM '{src}/embeddings.parquet', reps
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)"""
    )
    for t in ("documents", "embeddings"):
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT "
            f"{'text' if t == 'documents' else 'embedding'}) "
            f"FROM '{dst}/{t}.parquet'"
        ).fetchone()
        print(f"{t}: {n} rows, {d} distinct contents")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))

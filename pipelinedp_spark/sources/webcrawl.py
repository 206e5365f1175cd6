"""Web-crawl archive ingestion: a minimal WARC/WET record codec
(Common Crawl's WET files are WARC containers whose records carry
extracted plain text) and the DataFrame fan-out that turns opaque
archive blobs into one row per record.

The parser is length-driven (Content-Length), not delimiter-driven —
record payloads may contain anything, including header-lookalike
lines, so splitting on blank lines would corrupt records; this is the
same rule the WARC spec (ISO 28500) mandates for readers.

Scale shape: archives stay opaque ``binary`` cells until one Arrow
`mapInPandas` pass walks them; records are emitted as EXPLODED rows
(uri, date, record text) so a multi-gigabyte archive never becomes a
single giant array cell and per-record work (language ID, quality,
dedup) repartitions freely downstream.

No reference counterpart (net-new per the project north star).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame


def encode_wet(records: List[Tuple[str, str]],
               date: str = "2026-01-01T00:00:00Z") -> bytes:
    """Build a WET (WARC conversion-record) archive from (uri, text)
    pairs — the writer half used by tests and sinks."""
    out = []
    for uri, text in records:
        if any(c in uri for c in "\r\n"):
            raise ValueError(
                f"WARC-Target-URI may not contain CR/LF: {uri!r}")
        payload = text.encode("utf-8")
        headers = (f"WARC/1.0\r\n"
                   f"WARC-Type: conversion\r\n"
                   f"WARC-Target-URI: {uri}\r\n"
                   f"WARC-Date: {date}\r\n"
                   f"Content-Type: text/plain\r\n"
                   f"Content-Length: {len(payload)}\r\n"
                   f"\r\n").encode("ascii")
        out.append(headers + payload + b"\r\n\r\n")
    return b"".join(out)


def parse_wet_records(blob: Optional[bytes]
                      ) -> List[Tuple[str, str, str]]:
    """Walk a WET archive by Content-Length and return
    (target_uri, date, text) per conversion record. Malformed trailing
    bytes end the walk (partial archives parse up to the damage);
    non-WARC payloads return []."""
    if not blob:
        return []
    if blob[:2] == b"\x1f\x8b":          # gzip member(s): .wet.gz
        import gzip
        try:
            blob = gzip.decompress(blob)
        except (OSError, EOFError):
            return []
    records = []
    i, n = 0, len(blob)
    while i < n:
        # skip inter-record padding
        while i < n and blob[i:i + 1] in (b"\r", b"\n"):
            i += 1
        if not blob[i:i + 5] == b"WARC/":
            break
        hdr_end = blob.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            break
        headers = {}
        hdr_text = blob[i:hdr_end].decode("utf-8", "replace")
        for line in hdr_text.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + length > n:
            break
        if headers.get("warc-type", "conversion") == "conversion":
            records.append((headers.get("warc-target-uri", ""),
                            headers.get("warc-date", ""),
                            blob[body_start:body_start + length]
                            .decode("utf-8", "replace")))
        i = body_start + length
    return records


def extract_wet_records(df: DataFrame,
                        blob_col: str = "archive") -> DataFrame:
    """Explode WET archive blobs into (uri, date, text) rows — one
    Arrow pass, one output row per conversion record; undecodable
    blobs produce no rows."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            uris, dates, texts = [], [], []
            for blob in pdf[blob_col]:
                for uri, date, text in parse_wet_records(
                        bytes(blob) if blob is not None else None):
                    uris.append(uri)
                    dates.append(date)
                    texts.append(text)
            yield pd.DataFrame({"uri": uris, "date": dates,
                                "text": texts})

    return df.select(blob_col).mapInPandas(
        gen, "uri string, date string, text string")


# ---------------------------------------------------------------------------
# WebDataset-style tar shards (ustar)
# ---------------------------------------------------------------------------

def encode_tar(members: "List[Tuple[str, bytes]]") -> bytes:
    """Build an uncompressed POSIX ustar archive from (name, payload)
    members — the WebDataset shard shape (sample.jpg / sample.txt /
    sample.json grouped by basename). Stdlib tarfile, in-memory."""
    import io
    import tarfile
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def extract_tar_members(df: DataFrame,
                        blob_col: str = "shard",
                        suffixes: "Optional[List[str]]" = None
                        ) -> DataFrame:
    """Explode tar shard blobs into (key, suffix, payload) rows —
    WebDataset semantics: a member ``dir/abc.txt`` yields key
    ``dir/abc`` and suffix ``txt``, so one training sample's modalities
    (same key, different suffixes) can be regrouped with one groupBy.
    ``suffixes`` prunes members INSIDE the walk (a skipped member's
    payload is never copied out — pushdown for "text only" readers).
    Undecodable blobs produce no rows. One Arrow pass, exploded
    row-per-member output (a multi-GB shard never becomes one cell).
    """
    import io
    import tarfile

    keep = set(suffixes) if suffixes is not None else None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, sufs, payloads = [], [], []
            for blob in pdf[blob_col]:
                if blob is None:
                    continue
                try:
                    tf = tarfile.open(fileobj=io.BytesIO(bytes(blob)),
                                      mode="r")
                except tarfile.TarError:
                    continue
                # Corruption can also surface DURING iteration (a
                # truncated shard) — parse up to the damage instead of
                # failing the task.
                try:
                    with tf:
                        for info in tf:
                            if not info.isfile():
                                continue
                            key, dot, suf = info.name.rpartition(".")
                            if not dot:
                                key, suf = info.name, ""
                            if keep is not None and suf not in keep:
                                continue
                            member = tf.extractfile(info)
                            if member is None:
                                continue
                            keys.append(key)
                            sufs.append(suf)
                            payloads.append(member.read())
                except (tarfile.TarError, EOFError, OSError):
                    pass
            yield pd.DataFrame({"key": keys, "suffix": sufs,
                                "payload": payloads})

    return df.select(blob_col).mapInPandas(
        gen, "key string, suffix string, payload binary")

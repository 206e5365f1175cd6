"""Video columns as real containers: a from-scratch RIFF/AVI MJPEG
muxer + demuxer (struct-only, no codec library), container-level frame
sampling, and per-frame decode through the package's own baseline-JPEG
codec (`operators.jpeg`).

Scale shape: videos stay opaque ``binary`` cells until one Arrow
`mapInPandas` pass demuxes them; frame SAMPLING happens inside the
demux walk (a skipped frame's bytes are never copied out), and sampled
frames are emitted as EXPLODED rows — one (video, frame) row each —
so a long video never materializes as a single giant array cell and
downstream per-frame work (decode, stats, pHash) parallelizes across
partitions instead of across row-local arrays.

No reference counterpart (the reference has no multimodal support);
net-new per the project north star.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelinedp_spark.operators.jpeg import decode_jpeg


# ---------------------------------------------------------------------------
# RIFF/AVI mux (test-data generation and sinks)
# ---------------------------------------------------------------------------

def encode_avi_mjpeg(frames: Sequence[bytes], width: int, height: int,
                     fps: float = 10.0) -> bytes:
    """Mux JPEG-encoded frames into a minimal standard AVI (RIFF): one
    'vids'/'MJPG' stream, '00dc' movi chunks (even-padded), and a
    keyframe 'idx1' index — the layout every AVI reader accepts."""
    usec = int(round(1_000_000 / fps)) if fps > 0 else 0
    avih = struct.pack(
        "<14I", usec, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, max(int(round(fps)), 1),
                                            0, len(frames), 0, 10000, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks, idx, off = [], [], 4
    for fr in frames:
        movi_chunks.append(chunk(b"00dc", bytes(fr)))
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(fr)))
        off += len(movi_chunks[-1])
    movi = lst(b"movi", b"".join(movi_chunks))
    body = b"AVI " + hdrl + movi + chunk(b"idx1", b"".join(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# RIFF/AVI demux
# ---------------------------------------------------------------------------

def _riff_chunks(buf: bytes, start: int, end: int
                 ) -> Iterator[Tuple[bytes, int, int]]:
    i = start
    while i + 8 <= end:
        cid = buf[i:i + 4]
        size, = struct.unpack("<I", buf[i + 4:i + 8])
        data_end = min(i + 8 + size, end)
        yield cid, i + 8, data_end
        i += 8 + size + (size & 1)


def parse_avi_metadata(data: Optional[bytes]
                       ) -> Tuple[Optional[int], Optional[int],
                                  Optional[int], Optional[float]]:
    """(width, height, n_frames, fps) from the AVI main header (avih),
    or (None,)*4 for non-AVI payloads."""
    if (not data or len(data) < 24 or data[:4] != b"RIFF"
            or data[8:12] != b"AVI "):
        return None, None, None, None
    try:
        for cid, s, e in _riff_chunks(data, 12, len(data)):
            if cid == b"LIST" and data[s:s + 4] == b"hdrl":
                for c2, s2, e2 in _riff_chunks(data, s + 4, e):
                    if c2 == b"avih" and e2 - s2 >= 40:
                        v = struct.unpack("<10I", data[s2:s2 + 40])
                        fps = (round(1_000_000 / v[0], 6)
                               if v[0] else None)
                        return v[8], v[9], v[4], fps
    except struct.error:
        pass
    return None, None, None, None


def iter_avi_frames(data: bytes) -> Iterator[bytes]:
    """Yield the video-stream payloads ('##dc'/'##db' movi chunks) in
    stream order. A generator so samplers can skip frames without
    copying their bytes."""
    for cid, s, e in _riff_chunks(data, 12, len(data)):
        if cid == b"LIST" and data[s:s + 4] == b"movi":
            for c2, s2, e2 in _riff_chunks(data, s + 4, e):
                if c2[2:4] in (b"dc", b"db"):
                    yield data[s2:e2]


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------

def extract_avi_metadata(df: DataFrame,
                         video_col: str = "video") -> DataFrame:
    """Append (width, height, n_frames, fps) typed metadata columns —
    header walk only, frame bytes untouched. One Arrow batch pass."""
    @F.pandas_udf("struct<width:int,height:int,n_frames:int,fps:double>")
    def meta(col: pd.Series) -> pd.DataFrame:
        rows = [parse_avi_metadata(bytes(v) if v is not None else None)
                for v in col]
        return pd.DataFrame(rows, columns=["width", "height",
                                           "n_frames", "fps"])
    return df.withColumn("__m__", meta(F.col(video_col))) \
             .withColumn("width", F.col("__m__.width")) \
             .withColumn("height", F.col("__m__.height")) \
             .withColumn("n_frames", F.col("__m__.n_frames")) \
             .withColumn("fps", F.col("__m__.fps")) \
             .drop("__m__")


def sample_video_frames_avi(df: DataFrame,
                            video_col: str = "video",
                            id_col: str = "doc_id",
                            every_nth: int = 1,
                            max_frames: Optional[int] = None,
                            decode: bool = False) -> DataFrame:
    """Demux AVI/MJPEG videos and emit every ``every_nth``-th frame
    (capped at ``max_frames``) as EXPLODED (id, frame_idx, width,
    height, frame) rows; with ``decode=True`` each sampled frame also
    runs through the from-scratch JPEG codec and adds ``mean_luma``
    (mean ITU-R 601 luma of the decoded pixels; null when the frame
    payload does not decode). Undecodable / non-AVI videos produce no
    rows.

    Scale: sampling happens inside the demux walk (skipped frames are
    never copied), decode cost is per SAMPLED frame only, and the
    output is row-per-frame so Spark repartitions frame work freely.
    """
    if every_nth < 1:
        raise ValueError(f"every_nth={every_nth} must be >= 1")
    schema = f"{id_col} long, frame_idx long, width int, height int, " \
             + ("mean_luma double" if decode else "frame binary")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict = {id_col: [], "frame_idx": [], "width": [],
                         "height": [],
                         ("mean_luma" if decode else "frame"): []}
            for vid, data in zip(pdf[id_col], pdf[video_col]):
                if data is None:
                    continue
                data = bytes(data)
                w, h, _, _ = parse_avi_metadata(data)
                if w is None:
                    continue
                taken = 0
                for i, fr in enumerate(iter_avi_frames(data)):
                    if i % every_nth:
                        continue
                    if max_frames is not None and taken >= max_frames:
                        break
                    taken += 1
                    out[id_col].append(vid)
                    out["frame_idx"].append(i)
                    out["width"].append(w)
                    out["height"].append(h)
                    if decode:
                        rgb = decode_jpeg(fr)
                        out["mean_luma"].append(
                            float(np.mean(
                                rgb @ np.array([0.299, 0.587, 0.114])))
                            if rgb is not None else None)
                    else:
                        out["frame"].append(fr)
            yield pd.DataFrame(out)

    return df.select(id_col, video_col).mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# Video fingerprinting / near-dup
# ---------------------------------------------------------------------------

def video_phash(df: DataFrame,
                video_col: str = "video",
                id_col: str = "doc_id",
                every_nth: int = 2,
                max_frames: Optional[int] = 8,
                mode: str = "majority") -> DataFrame:
    """63-bit video fingerprint: per-frame perceptual hash
    (`multimodal.phash64`, DCT-sign) over the SAMPLED frames, combined
    by per-bit majority — the frame-set signature that survives
    trailing-credit / appended-frame variation (sampling + cap pin the
    compared prefix) and single-frame corruption (majority vote).
    Returns (id_col, vfp, n_hashed); vfp is null when no sampled frame
    decodes. One Arrow pass; decode + pHash cost is per SAMPLED frame.

    ``mode='keyframe'`` is the 100-TB scale path: hash only the FIRST
    decodable sampled frame and stop demuxing — per-video decode cost
    drops from max_frames JPEGs to one, and the demux walk ends at the
    first hit instead of striding the whole container. The keyframe
    hash loses the majority vote's single-frame-corruption tolerance
    (a corrupt head frame falls through to the next sampled frame, but
    a perturbed-yet-decodable one defines the fingerprint), which is
    the standard trade video fingerprinting makes at fleet scale —
    near-dup copies of the same cut share their opening frame."""
    from pipelinedp_spark.operators.multimodal import phash64
    if every_nth < 1:
        raise ValueError(f"every_nth={every_nth} must be >= 1")
    if mode not in ("majority", "keyframe"):
        raise ValueError(
            f"mode must be 'majority' or 'keyframe', got {mode!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps, ns = [], [], []
            for vid, data in zip(pdf[id_col], pdf[video_col]):
                if data is None:
                    continue
                data = bytes(data)
                if parse_avi_metadata(data)[0] is None:
                    continue
                hashes, taken = [], 0
                for i, fr in enumerate(iter_avi_frames(data)):
                    if i % every_nth:
                        continue
                    if max_frames is not None and taken >= max_frames:
                        break
                    taken += 1
                    ph = phash64(decode_jpeg(fr))
                    if ph is not None:
                        hashes.append(ph)
                        if mode == "keyframe":
                            break
                if not hashes:
                    vfp = None
                else:
                    arr = np.array(hashes, dtype=np.uint64)
                    ones = np.zeros(63, dtype=np.int64)
                    for b in range(63):
                        ones[b] = int(
                            ((arr >> np.uint64(b))
                             & np.uint64(1)).sum())
                    maj = (ones * 2 >= len(hashes)).astype(np.uint64)
                    vfp = int((maj << np.arange(63, dtype=np.uint64))
                              .sum())
                ids.append(vid)
                fps.append(vfp)
                ns.append(len(hashes))
            # vfp as object dtype: 63-bit ints + None as a plain list
            # would coerce to float64 and round the fingerprints (see
            # multimodal.image_phash)
            yield pd.DataFrame({id_col: ids,
                                "vfp": pd.Series(fps, dtype="object"),
                                "n_hashed": ns})

    return df.select(id_col, video_col).mapInPandas(
        gen, f"{id_col} long, vfp long, n_hashed int")


def video_dedup(df: DataFrame,
                video_col: str = "video",
                id_col: str = "doc_id",
                max_hamming: int = 0,
                num_blocks: int = 4,
                every_nth: int = 2,
                max_frames: Optional[int] = 8,
                mode: str = "majority") -> DataFrame:
    """Video near-dup flags from sampled-frame fingerprints — the same
    dedup machinery as image/audio (`multimodal._hash_dedup_flags`):
    exact mode is one groupBy on the fingerprint; near mode uses
    pigeonhole bit-block equi-joins (never all-pairs). Returns
    (id_col, vfp, is_dup). ``mode='keyframe'`` fingerprints only the
    first decodable sampled frame (see `video_phash`) — the decode
    cost per video becomes O(1) instead of O(max_frames), the right
    default at corpus scale."""
    from pipelinedp_spark.operators.multimodal import _hash_dedup_flags
    hashed = video_phash(df, video_col, id_col, every_nth,
                         max_frames, mode).select(id_col, "vfp") \
        .filter(F.col("vfp").isNotNull())
    return _hash_dedup_flags(hashed, id_col, "vfp", 63,
                             max_hamming, num_blocks)

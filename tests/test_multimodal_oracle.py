"""The multimodal oracles re-parse the 13-byte big-endian media header
and re-derive every decode feature / sampled frame from hex(payload) in
pure SQL. This pins that SQL against the Python decode/sampler on
synthesized payloads plus hostile rows (short payload, bad magic, bad
media type) — the error-sentinel path must agree across engines too."""

import hashlib
import os
import shutil

import duckdb
import pandas as pd

from docling_metrics_spark.multimodal import (
    HEADER,
    MEDIA_TYPES,
    _decode_stub,
    synth_payload,
)

FEATURE_KEYS = [
    "media_type", "width", "height", "n_bytes", "mean_byte",
    "n_distinct_bytes", "checksum", "decoder",
]


def _media_rows():
    rows = []
    for off in range(12):
        mt = off % 3
        w, h = 64 + (off % 4) * 32, 48 + (off % 3) * 16
        ref = f"media://doc{off}/{off}"
        rows.append(
            {"doc_id": f"doc{off}", "media_ref": ref,
             "media_type": MEDIA_TYPES[mt], "width": w, "height": h,
             "payload": synth_payload(ref, mt, w, h)}
        )
    rows.append({"doc_id": "bad1", "media_ref": "m://bad1",
                 "media_type": "image", "width": 1, "height": 1,
                 "payload": b"\x01\x02"})
    rows.append({"doc_id": "bad2", "media_ref": "m://bad2",
                 "media_type": "image", "width": 1, "height": 1,
                 "payload": b"XXXX" + bytes(20)})
    rows.append({"doc_id": "bad3", "media_ref": "m://bad3",
                 "media_type": "video", "width": 1, "height": 1,
                 "payload": HEADER.pack(b"DMSK", 9, 1, 1, 4) + bytes(4)})
    # magic-valid but TRUNCATED below the 13-byte header: the engine's
    # struct.error path; substring-past-end must not forge a header in SQL
    rows.append({"doc_id": "bad4", "media_ref": "m://bad4",
                 "media_type": "image", "width": 1, "height": 1,
                 "payload": b"DMSK\x00\x00\x00"})
    return rows


def test_multimodal_oracles_match_python(tmp_path):
    from docling_metrics_spark.plans.queries import (
        _FRAME_ORACLE,
        _MEDIA_PATH,
        _MULTIMODAL_ORACLE,
    )

    rows = _media_rows()
    pd.DataFrame(rows).to_parquet(tmp_path / "p.parquet")
    con = duckdb.connect()
    con.execute("SET threads=2")

    feat = (
        con.execute(_MULTIMODAL_ORACLE.replace(_MEDIA_PATH, str(tmp_path)))
        .df()
        .set_index("media_ref")
    )
    assert len(feat) == len(rows)
    for r in rows:
        exp = _decode_stub(r["payload"])
        got = feat.loc[r["media_ref"]]
        for k in FEATURE_KEYS:
            if isinstance(exp[k], float):
                assert abs(exp[k] - got[k]) < 1e-12, (r["media_ref"], k)
            else:
                assert str(exp[k]) == str(got[k]), (r["media_ref"], k)

    frames = con.execute(
        _FRAME_ORACLE.replace(_MEDIA_PATH, str(tmp_path))
    ).df()
    exp_frames = set()
    for r in rows:
        if r["media_type"] != "video":
            continue
        body = bytes(r["payload"])[HEADER.size:]
        n_frames = max(len(body) // 256, 1)
        for i in range(0, n_frames, 4):
            fr = body[i * 256:(i + 1) * 256]
            exp_frames.add(
                (r["media_ref"], i,
                 hashlib.md5(fr.hex().encode()).hexdigest())
            )
    got_frames = set(
        zip(frames["media_ref"], frames["frame_index"],
            frames["frame_checksum"])
    )
    assert got_frames == exp_frames and len(exp_frames) > 0

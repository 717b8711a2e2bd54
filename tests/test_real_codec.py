"""Real-codec swap-in proof: runs only where Pillow is installed (skipped
in this container), so the decode='real' path is exercised before anyone
deploys multimodal outside the sandbox. Also pins the in-sandbox contract:
decode='real' raises a clear NotImplementedError, not an import crash."""
from __future__ import annotations

import pytest

from beymani_spark.operators import multimodal


def _media_df(spark, payloads: list[bytes]):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "media_id": range(len(payloads)),
            "kind": "image",
            "payload": payloads,
            "meta": [
                {"format": "png", "width": 16, "height": 16, "duration_ms": 0}
            ]
            * len(payloads),
        }
    )
    return spark.createDataFrame(pdf, multimodal.MEDIA_SCHEMA)


def test_real_decode_without_codec_raises_clearly(spark):
    pytest.importorskip("pyspark")
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present — covered by test_real_decode_with_pil")
    except ImportError:
        pass
    df = _media_df(spark, [b"not-an-image"])
    with pytest.raises(Exception, match="Pillow|NotImplementedError"):
        multimodal.decode_features(df, decode="real").collect()


def test_real_decode_with_pil(spark):
    """Skip-if-missing: decodes a real PNG through the full mapInPandas
    plumbing when Pillow is importable."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    import numpy as np

    payloads = []
    for val in (0, 128, 255):
        img = Image.fromarray(np.full((16, 16), val, dtype=np.uint8), mode="L")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        payloads.append(buf.getvalue())
    df = _media_df(spark, payloads)

    feats = {
        r.media_id: r.features
        for r in multimodal.decode_features(df, decode="real").collect()
    }
    # constant-value images: all mass in one histogram bucket, sums to 1
    for mid, f in feats.items():
        assert abs(sum(f) - 1.0) < 1e-9
        assert max(f) == 1.0

    px = {
        r.media_id: r.pixels
        for r in multimodal.resize(df, width=4, height=4, decode="real").collect()
    }
    assert px[0] == [0] * 16
    assert px[2] == [255] * 16

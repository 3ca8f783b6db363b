"""The stub->real decode seam: with PIL present the fake=False path decodes a
real PNG through the SAME stage plumbing; without it, the seam fails loudly
instead of silently faking. Exactly one of these runs in any environment."""
import importlib.util

import numpy as np
import pyarrow as pa
import pytest

_HAS_PIL = importlib.util.find_spec("PIL") is not None


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed in this container")
def test_real_decode_path_with_pil(ray_session):
    import io

    import ray.data
    from PIL import Image

    from wikidata_edit_history_ray.stages.media import extract_media_features

    buf = io.BytesIO()
    Image.fromarray(
        np.arange(20 * 10 * 3, dtype=np.uint8).reshape(20, 10, 3)).save(
        buf, format="PNG")
    t = pa.table({
        "media_ref": pa.array(["media://img/real.png"], type=pa.string()),
        "media_type": pa.array(["image"], type=pa.string()),
        "payload": pa.array([buf.getvalue()], type=pa.binary()),
        "width": pa.array([10], type=pa.int32()),
        "height": pa.array([20], type=pa.int32()),
        "duration_ms": pa.array([0], type=pa.int32()),
    })
    out = extract_media_features(ray.data.from_arrow(t), batch_size=4,
                                 fake=False).take_all()
    assert out[0]["decoded_height"] == 20 and out[0]["decoded_width"] == 10
    assert len(out[0]["media_features"]) == 16


@pytest.mark.skipif(_HAS_PIL, reason="PIL present: real path covered above")
def test_real_decode_raises_cleanly_without_pil():
    from wikidata_edit_history_ray.stages.media import _decode_image_real

    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_image_real(b"\x89PNG fake bytes")

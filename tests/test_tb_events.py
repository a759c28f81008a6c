"""The hand-rolled TB event writer must produce files the REAL TensorBoard
reader accepts (tensorboard is installed in this image — the framework
itself never imports it)."""

import json

import numpy as np
import pytest

from stylemesh_tpu.utils.tb_events import TBEventWriter, convert_jsonl

ea = pytest.importorskip("tensorboard.backend.event_processing.event_accumulator")


def _load(path):
    acc = ea.EventAccumulator(path, size_guidance={
        ea.SCALARS: 0, ea.IMAGES: 0})
    acc.Reload()
    return acc


def test_scalars_round_trip(tmp_path):
    w = TBEventWriter(str(tmp_path))
    for step, v in enumerate([3.5, 2.25, -1.0]):
        w.add_scalar("Loss/train/total", v, step)
    w.add_scalar("Loss/val/style", 7.75, 2)
    w.close()

    acc = _load(w.path)
    assert set(acc.Tags()["scalars"]) == {"Loss/train/total", "Loss/val/style"}
    ev = acc.Scalars("Loss/train/total")
    assert [e.step for e in ev] == [0, 1, 2]
    np.testing.assert_allclose([e.value for e in ev], [3.5, 2.25, -1.0])


def test_image_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((12, 17, 3)).astype(np.float32)
    w = TBEventWriter(str(tmp_path))
    w.add_image("Images/train", img, 5)
    w.close()

    acc = _load(w.path)
    assert "Images/train" in acc.Tags()["images"]
    im = acc.Images("Images/train")[0]
    assert (im.height, im.width) == (12, 17)
    assert im.step == 5
    # PNG payload decodes back to the quantized pixels
    import io

    from PIL import Image

    arr = np.asarray(Image.open(io.BytesIO(im.encoded_image_string)))
    np.testing.assert_array_equal(
        arr, (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8))


def test_convert_jsonl(tmp_path):
    recs = [{"tag": "Batch/Loss/train/total", "value": 1.5, "step": 1},
            {"tag": "Batch/Loss/train/total", "value": 0.5, "step": 2}]
    p = tmp_path / "metrics.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    out = convert_jsonl(str(p))
    acc = _load(out)
    ev = acc.Scalars("Batch/Loss/train/total")
    assert [(e.step, e.value) for e in ev] == [(1, 1.5), (2, 0.5)]


def test_metrics_logger_tb(tmp_path):
    from stylemesh_tpu.utils.logging import MetricsLogger

    lg = MetricsLogger(str(tmp_path), tb=True)
    lg.batch_losses("train", {"total": 4.0, "style": 3.0}, 1)
    lg.close()
    acc = _load(lg._tb.path)
    assert set(acc.Tags()["scalars"]) == {"Batch/Loss/train/total",
                                          "Batch/Loss/train/style"}

"""Hand-computed golden tests for the numpy COCOEval and TaskEvaluator."""
import numpy as np

from toist_tpu.eval.coco_eval import COCOEval, EvalParams, box_iou_xywh
from toist_tpu.eval.evaluator import TaskEvaluator, gt_records_from_json, mean_ap50
from toist_tpu.ops import rle as rle_ops


def _gt(img, bbox, gid, area=None, iscrowd=0):
    return {"id": gid, "image_id": img, "category_id": 1, "bbox": bbox,
            "area": area if area is not None else bbox[2] * bbox[3],
            "iscrowd": iscrowd}


def _dt(img, bbox, score):
    return {"image_id": img, "category_id": 1, "bbox": bbox, "score": score}


def test_box_iou_xywh():
    d = np.array([[0, 0, 10, 10]], float)
    g = np.array([[5, 0, 10, 10]], float)
    iou = box_iou_xywh(d, g, np.zeros(1))
    np.testing.assert_allclose(iou, [[50 / 150]])
    # Crowd: union = dt area.
    iou_c = box_iou_xywh(d, g, np.ones(1))
    np.testing.assert_allclose(iou_c, [[0.5]])


def test_perfect_detection_ap1():
    gts = [_gt(1, [10, 10, 20, 20], 1), _gt(1, [50, 50, 10, 10], 2)]
    dts = [_dt(1, [10, 10, 20, 20], 0.9), _dt(1, [50, 50, 10, 10], 0.8)]
    stats = COCOEval(gts, dts).stats()
    np.testing.assert_allclose(stats[0], 1.0)   # AP@[.5:.95]
    np.testing.assert_allclose(stats[1], 1.0)   # AP@0.5
    np.testing.assert_allclose(stats[8], 1.0)   # AR@100


def test_fp_before_tp_halves_ap():
    # FP at score 1.0, perfect TP at 0.5: envelope precision = 0.5 everywhere.
    gts = [_gt(1, [10, 10, 20, 20], 1)]
    dts = [_dt(1, [200, 200, 5, 5], 1.0), _dt(1, [10, 10, 20, 20], 0.5)]
    stats = COCOEval(gts, dts).stats()
    np.testing.assert_allclose(stats[1], 0.5, atol=1e-6)


def test_localization_threshold():
    # IoU = 0.6 exactly: TP at thresholds .5,.55,.6 -> AP@[.5:.95] = 0.3.
    gts = [_gt(1, [0, 0, 10, 10], 1)]
    dts = [_dt(1, [0, 0, 10, 6], 0.9)]  # inter 60, union 100 -> IoU 0.6
    stats = COCOEval(gts, dts).stats()
    np.testing.assert_allclose(stats[1], 1.0)
    np.testing.assert_allclose(stats[0], 0.3, atol=1e-6)


def test_missed_gt_caps_recall():
    gts = [_gt(1, [0, 0, 10, 10], 1), _gt(1, [100, 100, 10, 10], 2)]
    dts = [_dt(1, [0, 0, 10, 10], 0.9)]
    stats = COCOEval(gts, dts).stats()
    # recall 0.5; precision 1 up to recall .5 then 0 -> AP ~ 51/101
    np.testing.assert_allclose(stats[1], 51 / 101, atol=1e-6)
    np.testing.assert_allclose(stats[8], 0.5)


def test_crowd_gt_not_counted_and_matchable():
    # One crowd gt: detections matching it are ignored (neither TP nor FP),
    # and the crowd doesn't count toward npig -> with a normal gt too, AP = 1.
    gts = [_gt(1, [0, 0, 10, 10], 1),
           _gt(1, [100, 100, 50, 50], 2, iscrowd=1)]
    dts = [_dt(1, [0, 0, 10, 10], 0.9),
           _dt(1, [100, 100, 50, 50], 0.8),
           _dt(1, [110, 110, 40, 40], 0.7)]
    stats = COCOEval(gts, dts).stats()
    np.testing.assert_allclose(stats[1], 1.0)


def test_area_ranges():
    # One small (16 px^2) and one large (10000 px^2) gt, both detected.
    gts = [_gt(1, [0, 0, 4, 4], 1), _gt(1, [50, 50, 100, 100], 2)]
    dts = [_dt(1, [0, 0, 4, 4], 0.9), _dt(1, [50, 50, 100, 100], 0.8)]
    ev = COCOEval(gts, dts)
    stats = ev.stats()
    np.testing.assert_allclose(stats[3], 1.0)  # AP small
    np.testing.assert_allclose(stats[5], 1.0)  # AP large
    assert stats[4] == -1.0                    # no medium gt


def test_max_dets_limit():
    gts = [_gt(1, [i * 20, 0, 10, 10], i + 1) for i in range(3)]
    dts = ([_dt(1, [200 + i, 200, 5, 5], 0.99 - 0.001 * i) for i in range(1)]
           + [_dt(1, [i * 20, 0, 10, 10], 0.5 - 0.01 * i) for i in range(3)])
    ev = COCOEval(gts, dts)
    stats = ev.stats()
    # AR@1: only top-1 det kept (an FP) -> recall 0.
    np.testing.assert_allclose(stats[6], 0.0)
    np.testing.assert_allclose(stats[8], 1.0)  # AR@100 finds all


def test_segm_matches_bbox_for_solid_masks():
    h, w = 64, 64
    def mask_of(bbox):
        m = np.zeros((h, w), np.uint8)
        x, y, bw, bh = bbox
        m[y:y + bh, x:x + bw] = 1
        return rle_ops.encode(m)
    g_bbox, d_bbox = [8, 8, 16, 16], [10, 8, 16, 16]
    gts = [dict(_gt(1, [float(v) for v in g_bbox], 1),
                segmentation=mask_of(g_bbox))]
    dts = [dict(_dt(1, [float(v) for v in d_bbox], 0.9),
                segmentation=mask_of(d_bbox))]
    sb = COCOEval(gts, dts, "bbox").stats()
    sm = COCOEval(gts, dts, "segm").stats()
    np.testing.assert_allclose(sb, sm)


def test_task_evaluator_roundtrip():
    coco_json = {
        "images": [{"id": 1, "height": 64, "width": 64},
                   {"id": 2, "height": 64, "width": 64}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [8, 8, 16, 16], "area": 256.0, "iscrowd": 0,
             "segmentation": [[8, 8, 24, 8, 24, 24, 8, 24]]},
            {"id": 2, "image_id": 2, "category_id": 2,   # non-preferred: dropped
             "bbox": [0, 0, 10, 10], "area": 100.0, "iscrowd": 0},
        ],
    }
    gts = gt_records_from_json(coco_json)
    assert len(gts) == 1 and "segmentation" in gts[0]
    ev = TaskEvaluator(gts, iou_types=("bbox",))
    scores = np.array([[0.95, 0.1]])
    boxes = np.array([[[8.0, 8.0, 24.0, 24.0], [0, 0, 5, 5]]])
    ev.update(np.array([1]), scores, boxes, valid=np.array([True]))
    # Duplicate update for the same image id is ignored.
    ev.update(np.array([1]), scores, boxes, valid=np.array([True]))
    stats = ev.summarize()
    np.testing.assert_allclose(stats["bbox"][1], 1.0)
    assert mean_ap50({1: stats}) == 1.0

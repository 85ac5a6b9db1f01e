"""Pure-numpy COCO evaluator sanity tests."""
import numpy as np

from satellite_pose_estimation_tpu.data.coco import CocoEvaluator, _iou_matrix


def test_iou_matrix():
    a = np.asarray([[0, 0, 10, 10]], np.float32)
    b = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                   np.float32)
    iou = _iou_matrix(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, rtol=1e-5)
    np.testing.assert_allclose(iou[0, 2], 0.0)


def test_perfect_detections_ap1():
    ev = CocoEvaluator()
    gt = np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    labels = np.asarray([1, 2])
    ev.update(gt, labels, gt, labels, np.asarray([0.9, 0.8]))
    stats = ev.summarize()
    assert stats["AP"] == 1.0 and stats["AP50"] == 1.0


def test_missed_detection_lowers_ap():
    ev = CocoEvaluator()
    gt = np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    labels = np.asarray([1, 1])
    # detect only the first box
    ev.update(gt, labels, gt[:1], labels[:1], np.asarray([0.9]))
    stats = ev.summarize()
    assert 0.4 < stats["AP50"] < 0.6


def test_localization_quality_affects_high_iou_ap():
    ev = CocoEvaluator()
    gt = np.asarray([[0, 0, 100, 100]], np.float32)
    det = np.asarray([[10, 10, 100, 100]], np.float32)  # IoU = 0.81
    ev.update(gt, [1], det, [1], [0.9])
    stats = ev.summarize()
    assert stats["AP50"] == 1.0
    assert stats["AP75"] == 1.0
    assert stats["AP"] < 1.0  # fails at IoU >= 0.85


def test_false_positive_lowers_precision():
    ev = CocoEvaluator()
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    dets = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    # false positive scored higher than the true positive
    ev.update(gt, [1], dets, [1, 1], [0.5, 0.9])
    stats = ev.summarize()
    assert stats["AP50"] < 1.0

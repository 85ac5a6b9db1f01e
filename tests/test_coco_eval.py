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


# ---------------------------------------------------------------------------
# Protocol goldens. pycocotools is not installed in this image, so the
# golden comes from (a) a hand-derived fixture whose AP is computed
# analytically below from the exact COCOeval accumulate() semantics
# (pycocotools cocoeval.py: greedy last-wins-on-tie matching over
# iouThrs=linspace(.5,.95,10), maxDets 100, monotone precision envelope,
# searchsorted-LEFT STEP lookup at recThrs=linspace(0,1,101) — NOT linear
# interpolation), and (b) an independent scalar-loop re-implementation of
# that algorithm, fuzz-compared against the fast evaluator.
# ---------------------------------------------------------------------------


def test_hand_derived_protocol_golden():
    """1 category, 1 image, GT A/B; dets: exact hit on A (s .9), IoU-0.82
    hit on B (s .8), far FP (s .7).

    t in {.50...80} (7 thresholds): TP,TP,FP -> rc [.5,1,1],
      pr-envelope [1,1,2/3]; every recall point r<=1 finds precision 1
      (searchsorted hits index 0 or 1) -> AP_t = 1.
    t in {.85,.90,.95} (3): TP,FP,FP -> rc [.5,.5,.5], envelope
      [1,.5,1/3]; points <= .5 -> index 0 -> 1.0 (51 of 101), points > .5
      -> past the end -> 0 -> AP_t = 51/101.
    AP = (7*1 + 3*51/101)/10; AP50 = AP75 = 1.
    (Under the old linear interpolation AP_t for the high thresholds would
    have bled precision between recall .5 and 1 — this fixture pins the
    step semantics.)"""
    ev = CocoEvaluator()
    gt = np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
    dets = np.asarray(
        [[0, 0, 10, 10], [20, 20, 30, 28.2], [50, 50, 60, 60]], np.float64
    )
    ev.update(gt, [1, 1], dets, [1, 1, 1], [0.9, 0.8, 0.7])
    stats = ev.summarize()
    want_ap = (7 * 1.0 + 3 * (51.0 / 101.0)) / 10.0
    np.testing.assert_allclose(stats["AP"], want_ap, rtol=1e-12)
    assert stats["AP50"] == 1.0 and stats["AP75"] == 1.0


def _oracle_coco_ap(images):
    """Independent scalar-loop COCOeval (bbox, areaRng all, maxDets 100),
    written directly from pycocotools cocoeval.py evaluateImg/accumulate.
    images: list of (gt_boxes, gt_labels, det_boxes, det_labels, scores)."""
    iou_thrs = np.linspace(0.5, 0.95, 10)
    rec_thrs = np.linspace(0, 1, 101)

    def iou(a, b):
        ax1, ay1, ax2, ay2 = a
        bx1, by1, bx2, by2 = b
        iw = min(ax2, bx2) - max(ax1, bx1)
        ih = min(ay2, by2) - max(ay1, by1)
        if iw <= 0 or ih <= 0:
            return 0.0
        inter = iw * ih
        u = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
        return inter / u

    cats = set()
    for g_b, g_l, d_b, d_l, s in images:
        cats |= set(int(x) for x in g_l) | set(int(x) for x in d_l)

    per_cat_ap = []
    for cat in sorted(cats):
        # evaluateImg per image: greedy match per threshold
        records = []  # (score, img_idx, order_idx, matched_per_t)
        npig = 0
        for img_i, (g_b, g_l, d_b, d_l, s) in enumerate(images):
            g = [b for b, l in zip(g_b, g_l) if int(l) == cat]
            ds = sorted(
                [(float(sc), list(b)) for b, l, sc in zip(d_b, d_l, s)
                 if int(l) == cat],
                key=lambda e: -e[0],
            )[:100]
            npig += len(g)
            gtm = [[0] * len(g) for _ in iou_thrs]
            for oi, (sc, db) in enumerate(ds):
                matched = []
                for ti, t in enumerate(iou_thrs):
                    best_iou = min(t, 1 - 1e-10)
                    m = -1
                    for gi, gb in enumerate(g):
                        if gtm[ti][gi]:
                            continue
                        v = iou(db, gb)
                        if v < best_iou:
                            continue
                        best_iou = v
                        m = gi
                    if m > -1:
                        gtm[ti][m] = 1
                    matched.append(m > -1)
                records.append((sc, img_i, oi, matched))
        if npig == 0:
            continue
        # accumulate: global stable sort by -score (mergesort over the
        # concatenation order = image order, then per-image score order)
        records.sort(key=lambda e: (-e[0], e[1], e[2]))
        aps = []
        for ti in range(len(iou_thrs)):
            tp = fp = 0
            rc, pr = [], []
            for sc, _, _, matched in records:
                if matched[ti]:
                    tp += 1
                else:
                    fp += 1
                rc.append(tp / npig)
                pr.append(tp / (tp + fp))
            # monotone envelope (in place, right to left)
            for i in range(len(pr) - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            q = []
            for r_t in rec_thrs:
                # searchsorted left
                idx = None
                for i, r_v in enumerate(rc):
                    if r_v >= r_t:
                        idx = i
                        break
                q.append(pr[idx] if idx is not None else 0.0)
            aps.append(float(np.mean(q)))
        per_cat_ap.append(aps)
    arr = np.asarray(per_cat_ap)
    return {
        "AP": float(arr.mean()),
        "AP50": float(arr[:, 0].mean()),
        "AP75": float(arr[:, 5].mean()),
    }


def test_fuzz_matches_independent_oracle():
    """Random multi-image multi-category fixtures: the fast evaluator must
    equal the scalar from-spec oracle exactly."""
    rng = np.random.RandomState(4)
    for trial in range(4):
        images = []
        ev = CocoEvaluator()
        for _ in range(6):
            n_g, n_d = rng.randint(0, 5), rng.randint(0, 8)
            g_b = []
            for _ in range(n_g):
                x, y = rng.uniform(0, 80, 2)
                w, h = rng.uniform(5, 40, 2)
                g_b.append([x, y, x + w, y + h])
            g_l = rng.randint(0, 3, n_g)
            d_b = []
            for _ in range(n_d):
                if n_g and rng.rand() < 0.6:
                    # jittered copy of a gt box: exercises mid IoUs
                    bx = list(np.asarray(g_b[rng.randint(n_g)]) +
                              rng.uniform(-6, 6, 4))
                    if bx[2] <= bx[0] + 1:
                        bx[2] = bx[0] + 1
                    if bx[3] <= bx[1] + 1:
                        bx[3] = bx[1] + 1
                    d_b.append(bx)
                else:
                    x, y = rng.uniform(0, 80, 2)
                    w, h = rng.uniform(5, 40, 2)
                    d_b.append([x, y, x + w, y + h])
            d_l = rng.randint(0, 3, n_d)
            s = rng.rand(n_d)
            g_b = np.asarray(g_b, np.float64).reshape(-1, 4)
            d_b = np.asarray(d_b, np.float64).reshape(-1, 4)
            images.append((g_b, g_l, d_b, d_l, s))
            ev.update(g_b, g_l, d_b, d_l, s)
        want = _oracle_coco_ap(images)
        got = ev.summarize()
        for k in ("AP", "AP50", "AP75"):
            np.testing.assert_allclose(
                got[k], want[k], atol=1e-10,
                err_msg=f"trial {trial}: {k} deviates from protocol oracle",
            )

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
    per_cat_ar = {1: [], 10: [], 100: []}
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
        # AR@k: final recall with per-image dets capped at k (accumulate()
        # slices dtMatches columns [0:k]; greedy score-order matching makes
        # that identical to re-matching with k dets), mean over thresholds
        for k in (1, 10, 100):
            tp_t = [0] * len(iou_thrs)
            for sc, img_i, oi, matched in records:
                if oi < k:
                    for ti, m in enumerate(matched):
                        tp_t[ti] += int(m)
            per_cat_ar[k].append(float(np.mean([t / npig for t in tp_t])))
    arr = np.asarray(per_cat_ap)
    out = {
        "AP": float(arr.mean()),
        "AP50": float(arr[:, 0].mean()),
        "AP75": float(arr[:, 5].mean()),
    }
    for k in (1, 10, 100):
        out[f"AR{k}"] = float(np.mean(per_cat_ar[k]))
    return out


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
        for k in ("AP", "AP50", "AP75", "AR1", "AR10", "AR100"):
            np.testing.assert_allclose(
                got[k], want[k], atol=1e-10,
                err_msg=f"trial {trial}: {k} deviates from protocol oracle",
            )


# --------------------------------------------------------------------------
# segm iou-type (round 4, VERDICT item 7): mask IoU plugs into the same
# matching/accumulate machinery. Cross-check: filled-rectangle masks give
# bit-identical APs to the bbox path (their IoUs are equal by construction),
# which transitively re-validates segm against the scalar protocol oracle.
# --------------------------------------------------------------------------


def _boxes_to_masks(boxes, H=128, W=128):
    m = np.zeros((len(boxes), H, W), bool)
    for i, (x1, y1, x2, y2) in enumerate(np.asarray(boxes, int)):
        m[i, max(y1, 0):max(y2, 0), max(x1, 0):max(x2, 0)] = True
    return m


def test_segm_equals_bbox_on_rectangle_masks():
    rng = np.random.RandomState(11)
    ev_b = CocoEvaluator("bbox")
    ev_s = CocoEvaluator("segm")
    for _ in range(5):
        n_g, n_d = rng.randint(1, 4), rng.randint(1, 6)
        g = np.stack([
            np.sort(rng.randint(0, 100, 2)) + [0, 20] for _ in range(n_g)
        ])  # x1 x2
        g = np.concatenate([g[:, :1], g[:, :1] + 10, g[:, 1:], g[:, 1:] + 14],
                           1)[:, [0, 1, 2, 3]]
        g = np.stack([g[:, 0], g[:, 1], g[:, 2], g[:, 3]], 1).astype(float)
        # integer-aligned boxes so rectangle masks reproduce box IoU exactly
        d = np.clip(g[rng.randint(n_g, size=n_d)] +
                    rng.randint(-8, 8, (n_d, 4)), 0, 120).astype(float)
        d[:, 2] = np.maximum(d[:, 2], d[:, 0] + 2)
        d[:, 3] = np.maximum(d[:, 3], d[:, 1] + 2)
        gl = rng.randint(0, 2, n_g)
        dl = rng.randint(0, 2, n_d)
        s = rng.rand(n_d)
        ev_b.update(g, gl, d, dl, s)
        ev_s.update(None, gl, None, dl, s,
                    gt_masks=_boxes_to_masks(g), det_masks=_boxes_to_masks(d))
    got_b, got_s = ev_b.summarize(), ev_s.summarize()
    for k in ("AP", "AP50", "AP75"):
        np.testing.assert_allclose(got_s[k], got_b[k], atol=1e-12)


def test_segm_nonrectangular_hand_derived():
    """One GT L-shaped mask (75 px); detection covers its 50-px half plus
    25 px outside: IoU = 50/100 = 0.5 exactly -> matched at t=.50 only.
    AP_t=.50 with 1 TP / 1 gt: rc [1], pr [1] -> AP = 1; other 9
    thresholds: FP only -> 0. AP = 0.1, AP50 = 1, AP75 = 0."""
    ev = CocoEvaluator("segm")
    gt = np.zeros((1, 32, 32), bool)
    gt[0, 0:10, 0:5] = True   # 50 px
    gt[0, 0:5, 5:10] = True   # 25 px  (L shape, 75 total)
    det = np.zeros((1, 32, 32), bool)
    det[0, 0:10, 0:5] = True    # the 50-px half
    det[0, 20:25, 20:30] = True  # 50 px far away
    # inter 50, union 75 + 100 - 50 = 125? -> adjust: make det 100 px with
    # 50 inside: union = 75 + 100 - 50 = 125, IoU = 0.4. Use det = exactly
    # the 50-px half plus 25 px outside: area 75, inter 50, union 100.
    det[:] = False
    det[0, 0:10, 0:5] = True   # 50 inside
    det[0, 20:25, 20:25] = True  # 25 outside
    ev.update(None, [0], None, [0], [0.9], gt_masks=gt, det_masks=det)
    stats = ev.summarize()
    np.testing.assert_allclose(stats["AP"], 0.1, atol=1e-12)
    assert stats["AP50"] == 1.0 and stats["AP75"] == 0.0


def test_unknown_iou_type_raises():
    import pytest

    with pytest.raises(ValueError, match="keypoints"):
        CocoEvaluator("keypoints")

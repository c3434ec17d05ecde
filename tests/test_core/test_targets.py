import jax.numpy as jnp
import numpy as np

from tpudet.core.anchors import YOLOV4AnchorGenerator
from tpudet.core.targets import responsible_matches


def ref_responsible_triples(gt_bboxes_list, feat_hw, stride, anchor_wh,
                            neighbor=2, thres=4.0):
    """Independent numpy re-derivation of the reference assignment
    (yolov4_anchor_generator.py:12-134) returning (img, anchor, gt) triples
    as a set for comparison."""
    feat_h, feat_w = feat_hw
    num_base = len(anchor_wh)
    offsets = [(0, 0), (-1, 0), (0, -1), (1, 0), (0, 1)]
    triples = set()
    gt_offset = 0
    for img, gts in enumerate(gt_bboxes_list):
        for g, box in enumerate(gts):
            cx = (box[0] + box[2]) / 2
            cy = (box[1] + box[3]) / 2
            w = box[2] - box[0]
            h = box[3] - box[1]
            for a, (aw, ah) in enumerate(anchor_wh):
                dev = max(w / aw, aw / w, h / ah, ah / h)
                if not dev < thres:
                    continue
                xg, yg = cx / stride, cy / stride
                xi, yi = feat_w - xg, feat_h - yg
                ok = [True,
                      (xg % 1 < 0.5) and (xg > 1),
                      (yg % 1 < 0.5) and (yg > 1),
                      (xi % 1 < 0.5) and (xi > 1),
                      (yi % 1 < 0.5) and (yi > 1)]
                if neighbor == 0:
                    ok = [True]
                for o, (dx, dy) in enumerate(offsets[:len(ok)]):
                    if not ok[o]:
                        continue
                    px = int(xg + dx)
                    py = int(yg + dy)
                    anchor_idx = (py * feat_w + px) * num_base + a
                    triples.add((img, anchor_idx, gt_offset + g))
        gt_offset += len(gts)
    return triples


def dense_to_triples(matches, gt_valid, num_base, num_offsets):
    """Convert LevelMatches slots back to (img, anchor, global_gt) triples."""
    anchor_idx = np.asarray(matches.anchor_idx)
    mask = np.asarray(matches.mask)
    b, g_max = gt_valid.shape
    gt_counts = gt_valid.sum(1)
    gt_base = np.concatenate([[0], np.cumsum(gt_counts)[:-1]])
    triples = set()
    for img in range(b):
        local = 0
        for g in range(g_max):
            if not gt_valid[img, g]:
                continue
            for a in range(num_base):
                for o in range(num_offsets):
                    if mask[img, g, a, o]:
                        triples.add((img, int(anchor_idx[img, g, a, o]),
                                     int(gt_base[img]) + local))
            local += 1
    return triples


def test_responsible_matches_parity_with_reference_semantics():
    gen = YOLOV4AnchorGenerator(
        strides=[8], base_sizes=[[(12, 16), (19, 36), (40, 28)]])
    anchor_wh = gen.base_anchor_wh()[0]
    feat_hw = (20, 20)  # 160x160 image at stride 8

    rng = np.random.RandomState(0)
    gt_list = []
    for n in [5, 0, 3]:  # second image has no gts
        xy = rng.rand(n, 2).astype(np.float32) * 120 + 10
        wh = rng.rand(n, 2).astype(np.float32) * 60 + 4
        gt_list.append(np.concatenate([xy, xy + wh], -1))

    ref = ref_responsible_triples(gt_list, feat_hw, 8.0, anchor_wh)

    g_max = 6
    padded = np.zeros((3, g_max, 4), np.float32)
    valid = np.zeros((3, g_max), bool)
    for i, g in enumerate(gt_list):
        padded[i, :len(g)] = g
        valid[i, :len(g)] = True

    matches = responsible_matches(
        jnp.asarray(padded), jnp.asarray(valid), feat_hw, 8.0, anchor_wh)
    got = dense_to_triples(matches, valid, 3, 5)
    assert got == ref
    assert len(ref) > 0


def test_responsible_matches_neighbor0_and_empty():
    gen = YOLOV4AnchorGenerator(strides=[16],
                                base_sizes=[[(36, 75), (76, 55)]])
    anchor_wh = gen.base_anchor_wh()[0]
    gt = np.array([[[32., 32., 70., 100.]]], np.float32)
    valid = np.array([[True]])
    m = responsible_matches(jnp.asarray(gt), jnp.asarray(valid), (10, 10),
                            16.0, anchor_wh, neighbor=0)
    assert m.mask.shape == (1, 1, 2, 1)
    # center (51, 66) -> cell (3, 4) -> flat 43; anchor 0 shape-matches
    mask = np.asarray(m.mask)[0, 0]
    idx = np.asarray(m.anchor_idx)[0, 0]
    assert mask[0, 0]
    assert idx[0, 0] == (4 * 10 + 3) * 2 + 0

    # all-invalid gts -> no matches
    m2 = responsible_matches(jnp.asarray(gt),
                             jnp.asarray(np.array([[False]])), (10, 10),
                             16.0, anchor_wh)
    assert not np.asarray(m2.mask).any()

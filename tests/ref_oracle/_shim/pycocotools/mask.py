"""Functional numpy implementation of the pycocotools.mask API subset the
reference uses.  RLE counts are kept as python lists (uncompressed),
column-major (Fortran) order like COCO."""
import numpy as np


def _rle_from_mask(m):
    # m: (h, w) uint8 -> column-major run lengths starting with 0-run
    h, w = m.shape
    flat = np.asfortranarray(m).flatten(order='F').astype(np.uint8)
    if flat.size == 0:
        return {'size': [h, w], 'counts': [0]}
    change = np.nonzero(np.diff(flat))[0] + 1
    idx = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(idx).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return {'size': [h, w], 'counts': runs}


def _mask_from_rle(rle):
    h, w = rle['size']
    counts = rle['counts']
    if isinstance(counts, (bytes, str)):
        counts = _decode_str(counts)
    flat = np.zeros(h * w, dtype=np.uint8)
    pos = 0
    val = 0
    for c in counts:
        flat[pos:pos + c] = val
        pos += c
        val = 1 - val
    return flat.reshape((h, w), order='F')


def _decode_str(s):
    """COCO compressed RLE (LEB128-ish) string -> counts list."""
    if isinstance(s, str):
        s = s.encode()
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1f) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= (-1) << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def encode(mask):
    """mask: (h, w) or (h, w, n) fortran uint8."""
    if mask.ndim == 2:
        return _rle_from_mask(mask)
    return [_rle_from_mask(mask[:, :, i]) for i in range(mask.shape[2])]


def decode(rleObjs):
    if isinstance(rleObjs, dict):
        return _mask_from_rle(rleObjs)
    masks = [_mask_from_rle(r) for r in rleObjs]
    return np.stack(masks, axis=2) if masks else np.zeros((0, 0, 0), np.uint8)


def area(rleObjs):
    single = isinstance(rleObjs, dict)
    if single:
        rleObjs = [rleObjs]
    out = []
    for r in rleObjs:
        counts = r['counts']
        if isinstance(counts, (bytes, str)):
            counts = _decode_str(counts)
        out.append(int(sum(counts[1::2])))
    return out[0] if single else np.array(out, dtype=np.uint32)


def toBbox(rleObjs):
    single = isinstance(rleObjs, dict)
    if single:
        rleObjs = [rleObjs]
    out = []
    for r in rleObjs:
        m = _mask_from_rle(r)
        ys, xs = np.nonzero(m)
        if len(xs) == 0:
            out.append([0, 0, 0, 0])
        else:
            out.append([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                        ys.max() - ys.min() + 1])
    out = np.array(out, dtype=np.float64)
    return out[0] if single else out


def merge(rleObjs, intersect=0):
    masks = [_mask_from_rle(r) for r in rleObjs]
    if not masks:
        return {'size': [0, 0], 'counts': [0]}
    acc = masks[0].astype(bool)
    for m in masks[1:]:
        acc = (acc & m.astype(bool)) if intersect else (acc | m.astype(bool))
    return _rle_from_mask(acc.astype(np.uint8))


def frPyObjects(pyobj, h, w):
    import cv2
    if isinstance(pyobj, dict):  # already RLE
        return dict(pyobj)
    if isinstance(pyobj, (list, np.ndarray)) and len(pyobj) and \
            isinstance(pyobj[0], (list, np.ndarray)):
        # list of polygons
        out = []
        for poly in pyobj:
            pts = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
            m = np.zeros((h, w), dtype=np.uint8)
            cv2.fillPoly(m, [np.round(pts).astype(np.int32)], 1)
            out.append(_rle_from_mask(m))
        return out
    if isinstance(pyobj, (list, np.ndarray)) and len(pyobj) and \
            isinstance(pyobj[0], (int, float)):
        pts = np.asarray(pyobj, dtype=np.float64).reshape(-1, 2)
        import cv2 as _cv2
        m = np.zeros((h, w), dtype=np.uint8)
        _cv2.fillPoly(m, [np.round(pts).astype(np.int32)], 1)
        return _rle_from_mask(m)
    if isinstance(pyobj, list):  # list of RLE dicts
        return [dict(o) for o in pyobj]
    raise TypeError('unsupported object for frPyObjects')


def iou(dt, gt, iscrowd):
    """IoU between RLE lists or bbox arrays (xywh)."""
    def to_masks(objs):
        if isinstance(objs, np.ndarray):
            return objs  # bbox mode handled below
        return [(_mask_from_rle(o) if isinstance(o, dict) else o)
                for o in objs]
    if isinstance(dt, np.ndarray) and isinstance(gt, np.ndarray):
        # bbox xywh mode
        ious = np.zeros((len(dt), len(gt)))
        for i, d in enumerate(dt):
            for j, g in enumerate(gt):
                ix = min(d[0] + d[2], g[0] + g[2]) - max(d[0], g[0])
                iy = min(d[1] + d[3], g[1] + g[3]) - max(d[1], g[1])
                inter = max(ix, 0) * max(iy, 0)
                union = d[2] * d[3] + g[2] * g[3] - inter \
                    if not (len(iscrowd) and iscrowd[j]) else d[2] * d[3]
                ious[i, j] = inter / union if union > 0 else 0
        return ious
    dts = to_masks(dt)
    gts = to_masks(gt)
    ious = np.zeros((len(dts), len(gts)))
    for i, d in enumerate(dts):
        db = d.astype(bool)
        for j, g in enumerate(gts):
            gb = g.astype(bool)
            inter = np.logical_and(db, gb).sum()
            union = db.sum() if (len(iscrowd) and iscrowd[j]) \
                else np.logical_or(db, gb).sum()
            ious[i, j] = inter / union if union > 0 else 0
    return ious

"""Pure-numpy COCOeval implementing the published pycocotools protocol
(greedy score-ordered matching per IoU threshold with crowd/ignore
semantics, 101-point interpolated precision, area-range / maxDets
breakdowns).

This is an independent re-implementation of the COCO evaluation
ALGORITHM (Lin et al., cocodataset.org) written for the oracle bridge —
pycocotools is not installed in this environment. It gives the reference
repo's ``CocoDataset.evaluate(metric='bbox'/'segm'/'proposal')``
(/root/reference/mmdet/datasets/coco.py:547-637) a working evaluator so
two-stack mAP A/B comparisons can run end-to-end.
"""
import copy
from collections import defaultdict

import numpy as np


class Params:
    def __init__(self, iouType='bbox'):
        self.imgIds = []
        self.catIds = []
        self.iouThrs = np.linspace(.5, 0.95,
                                   int(np.round((0.95 - .5) / .05)) + 1)
        self.recThrs = np.linspace(.0, 1.00,
                                   int(np.round((1.00 - .0) / .01)) + 1)
        self.maxDets = [1, 10, 100]
        self.areaRng = [[0., 1e5 ** 2], [0., 32 ** 2],
                        [32 ** 2, 96 ** 2], [96 ** 2, 1e5 ** 2]]
        self.areaRngLbl = ['all', 'small', 'medium', 'large']
        self.useCats = 1
        self.iouType = iouType


def _bbox_iou(dts, gts, iscrowd):
    """IoU of dt xywh boxes vs gt xywh boxes; crowd gts use dt-area-only
    union (same semantics as the reference's Cython iou_coco kernel,
    /root/reference/mmdet/ops/eval_utils/iou/iou_coco.pyx:44-48)."""
    d = np.asarray(dts, np.float64).reshape(-1, 4)
    g = np.asarray(gts, np.float64).reshape(-1, 4)
    ious = np.zeros((len(d), len(g)))
    for j, gt in enumerate(g):
        gx1, gy1, gw, gh = gt
        garea = gw * gh
        for i, dt in enumerate(d):
            dx1, dy1, dw, dh = dt
            iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
            if iw <= 0:
                continue
            ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
            if ih <= 0:
                continue
            inter = iw * ih
            union = dw * dh if iscrowd[j] else dw * dh + garea - inter
            if union > 0:
                ious[i, j] = inter / union
    return ious


class COCOeval:
    def __init__(self, cocoGt=None, cocoDt=None, iouType='bbox'):
        self.cocoGt = cocoGt
        self.cocoDt = cocoDt
        self.params = Params(iouType)
        self.evalImgs = defaultdict(list)
        self.eval = {}
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        self.ious = {}
        self.stats = []
        if cocoGt is not None:
            self.params.imgIds = sorted(cocoGt.getImgIds())
            self.params.catIds = sorted(cocoGt.getCatIds())

    def _prepare(self):
        p = self.params
        if p.useCats:
            gts = self.cocoGt.loadAnns(self.cocoGt.getAnnIds(
                imgIds=p.imgIds, catIds=p.catIds))
            dts = self.cocoDt.loadAnns(self.cocoDt.getAnnIds(
                imgIds=p.imgIds, catIds=p.catIds))
        else:
            gts = self.cocoGt.loadAnns(
                self.cocoGt.getAnnIds(imgIds=p.imgIds))
            dts = self.cocoDt.loadAnns(
                self.cocoDt.getAnnIds(imgIds=p.imgIds))
        for gt in gts:
            gt['ignore'] = gt.get('ignore', 0) or gt.get('iscrowd', 0)
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for gt in gts:
            self._gts[gt['image_id'], gt['category_id']].append(gt)
        for dt in dts:
            self._dts[dt['image_id'], dt['category_id']].append(dt)

    def computeIoU(self, imgId, catId):
        p = self.params
        if p.useCats:
            gt = self._gts[imgId, catId]
            dt = self._dts[imgId, catId]
        else:
            gt = [g for cId in p.catIds for g in self._gts[imgId, cId]]
            dt = [d for cId in p.catIds for d in self._dts[imgId, cId]]
        if len(gt) == 0 or len(dt) == 0:
            return []
        inds = np.argsort([-d['score'] for d in dt], kind='mergesort')
        dt = [dt[i] for i in inds]
        if len(dt) > p.maxDets[-1]:
            dt = dt[:p.maxDets[-1]]
        iscrowd = [int(o.get('iscrowd', 0)) for o in gt]
        if p.iouType == 'segm':
            from . import mask as maskUtils
            g = [self.cocoGt.annToRLE(o) for o in gt]
            d = [self.cocoDt.annToRLE(o) for o in dt]
            return maskUtils.iou(d, g, iscrowd)
        g = [o['bbox'] for o in gt]
        d = [o['bbox'] for o in dt]
        return _bbox_iou(d, g, iscrowd)

    def evaluateImg(self, imgId, catId, aRng, maxDet):
        p = self.params
        if p.useCats:
            gt = self._gts[imgId, catId]
            dt = self._dts[imgId, catId]
        else:
            gt = [g for cId in p.catIds for g in self._gts[imgId, cId]]
            dt = [d for cId in p.catIds for d in self._dts[imgId, cId]]
        if len(gt) == 0 and len(dt) == 0:
            return None

        for g in gt:
            if g['ignore'] or g['area'] < aRng[0] or g['area'] > aRng[1]:
                g['_ignore'] = 1
            else:
                g['_ignore'] = 0
        gtind = np.argsort([g['_ignore'] for g in gt], kind='mergesort')
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d['score'] for d in dt], kind='mergesort')
        dt = [dt[i] for i in dtind[:maxDet]]
        iscrowd = [int(o.get('iscrowd', 0)) for o in gt]
        ious = self.ious[imgId, catId]
        ious = ious[:, gtind] if len(ious) > 0 else ious

        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g['_ignore'] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious) != 0:
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        # gt already matched, and not a crowd -> skip
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        # dt matched an unignored gt and remaining gts are
                        # ignored -> stop (ignored gts sort last)
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]['id']
                    gtm[tind, m] = d['id']
        # unmatched dts outside the area range are ignored
        a = np.array([d['area'] < aRng[0] or d['area'] > aRng[1]
                      for d in dt]).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(
            dtm == 0, np.repeat(a, T, 0)))
        return {
            'image_id': imgId, 'category_id': catId, 'aRng': aRng,
            'maxDet': maxDet,
            'dtIds': [d['id'] for d in dt],
            'gtIds': [g['id'] for g in gt],
            'dtMatches': dtm, 'gtMatches': gtm,
            'dtScores': [d['score'] for d in dt],
            'gtIgnore': gtIg, 'dtIgnore': dtIg,
        }

    def evaluate(self):
        p = self.params
        p.imgIds = list(np.unique(p.imgIds))
        if p.useCats:
            p.catIds = list(np.unique(p.catIds))
        self.params = p
        self._prepare()
        catIds = p.catIds if p.useCats else [-1]
        self.ious = {(imgId, catId): self.computeIoU(imgId, catId)
                     for imgId in p.imgIds for catId in catIds}
        maxDet = p.maxDets[-1]
        self.evalImgs = [
            self.evaluateImg(imgId, catId, areaRng, maxDet)
            for catId in catIds
            for areaRng in p.areaRng
            for imgId in p.imgIds
        ]
        self._paramsEval = copy.deepcopy(self.params)

    def accumulate(self, p=None):
        if p is None:
            p = self.params
        p.catIds = p.catIds if p.useCats == 1 else [-1]
        T = len(p.iouThrs)
        R = len(p.recThrs)
        K = len(p.catIds)
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))

        _pe = self._paramsEval
        setK = set(_pe.catIds if _pe.useCats else [-1])
        setA = set(map(tuple, _pe.areaRng))
        setM = set(_pe.maxDets)
        setI = set(_pe.imgIds)
        k_list = [n for n, k in enumerate(p.catIds) if k in setK]
        m_list = [m for n, m in enumerate(p.maxDets) if m in setM]
        a_list = [n for n, a in enumerate(map(tuple, p.areaRng))
                  if a in setA]
        i_list = [n for n, i in enumerate(p.imgIds) if i in setI]
        I0 = len(_pe.imgIds)
        A0 = len(_pe.areaRng)
        for k, k0 in enumerate(k_list):
            Nk = k0 * A0 * I0
            for a, a0 in enumerate(a_list):
                Na = a0 * I0
                for m, maxDet in enumerate(m_list):
                    E = [self.evalImgs[Nk + Na + i] for i in i_list]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate(
                        [e['dtScores'][0:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind='mergesort')
                    dtScoresSorted = dtScores[inds]
                    dtm = np.concatenate(
                        [e['dtMatches'][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    dtIg = np.concatenate(
                        [e['dtIgnore'][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    gtIg = np.concatenate([e['gtIgnore'] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(np.logical_not(dtm),
                                         np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        ss = np.zeros((R,))
                        if nd:
                            recall[t, k, a, m] = rc[-1]
                        else:
                            recall[t, k, a, m] = 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(rc, p.recThrs, side='left')
                        try:
                            for ri, pi in enumerate(inds2):
                                q[ri] = pr[pi]
                                ss[ri] = dtScoresSorted[pi]
                        except IndexError:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
                        scores[t, :, k, a, m] = np.array(ss)
        self.eval = {
            'params': p,
            'counts': [T, R, K, A, M],
            'precision': precision,
            'recall': recall,
            'scores': scores,
        }

    def summarize(self):
        def _summarize(ap=1, iouThr=None, areaRng='all', maxDets=100):
            p = self.params
            aind = [i for i, a in enumerate(p.areaRngLbl) if a == areaRng]
            mind = [i for i, m in enumerate(p.maxDets) if m == maxDets]
            if ap == 1:
                s = self.eval['precision']
                if iouThr is not None:
                    t = np.where(np.isclose(iouThr, p.iouThrs))[0]
                    s = s[t]
                s = s[:, :, :, aind, mind]
            else:
                s = self.eval['recall']
                if iouThr is not None:
                    t = np.where(np.isclose(iouThr, p.iouThrs))[0]
                    s = s[t]
                s = s[:, :, aind, mind]
            if len(s[s > -1]) == 0:
                return -1.0
            return float(np.mean(s[s > -1]))

        p = self.params
        md = p.maxDets
        self.stats = np.array([
            _summarize(1, maxDets=md[-1]),
            _summarize(1, iouThr=.5, maxDets=md[-1]),
            _summarize(1, iouThr=.75, maxDets=md[-1]),
            _summarize(1, areaRng='small', maxDets=md[-1]),
            _summarize(1, areaRng='medium', maxDets=md[-1]),
            _summarize(1, areaRng='large', maxDets=md[-1]),
            _summarize(0, maxDets=md[0]),
            _summarize(0, maxDets=md[1] if len(md) > 1 else md[0]),
            _summarize(0, maxDets=md[-1]),
            _summarize(0, areaRng='small', maxDets=md[-1]),
            _summarize(0, areaRng='medium', maxDets=md[-1]),
            _summarize(0, areaRng='large', maxDets=md[-1]),
        ])

"""Known-answer tests for proposal recall and the VOC-protocol eval_map
(on top of the live-reference parity in tests/ref_oracle)."""
import numpy as np

from tpudet.evaluation.recall import coco_proposal_fast_eval, eval_recalls
from tpudet.evaluation.voc_map import eval_map, tpfp_default


def test_eval_recalls_perfect_and_none():
    gts = [np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)]
    props = [np.array([[0, 0, 10, 10, 0.9], [20, 20, 40, 40, 0.8],
                       [50, 50, 60, 60, 0.7]], np.float32)]
    r = eval_recalls(gts, props, [3], [0.5, 0.9])
    np.testing.assert_allclose(r, [[1.0, 1.0]])
    # budget of 1 proposal -> only the top-scored one counts
    r1 = eval_recalls(gts, props, [1], [0.5])
    np.testing.assert_allclose(r1, [[0.5]])
    # disjoint proposals -> zero recall
    r0 = eval_recalls(gts, [np.array([[50, 50, 60, 60, 1.0]], np.float32)],
                      [1], [0.5])
    np.testing.assert_allclose(r0, [[0.0]])


def test_proposal_fast_eval():
    ann = dict(gt_bboxes=np.array([[0, 0, 10, 10]], np.float32),
               gt_labels=np.array([0]),
               gt_attrs=dict(ignore=np.array([False]),
                             iscrowd=np.array([False]),
                             area=np.array([100.0], np.float32)))
    dets = [[np.array([[0, 0, 10, 10, 0.9]], np.float32)]]
    rep = coco_proposal_fast_eval(dets, [ann])
    assert rep['AR@100'] == 1.0 and rep['AR@1000'] == 1.0


def test_tpfp_ignore_region():
    # a det matching only an ignore-region gt is neither tp nor fp
    det = np.array([[0, 0, 10, 10, 0.9]], np.float32)
    gt = np.zeros((0, 4), np.float32)
    gt_ig = np.array([[0, 0, 10, 10]], np.float32)
    tp, fp = tpfp_default(det, gt, gt_ig, iou_thr=0.5)
    assert tp.sum() == 0 and fp.sum() == 0
    # without the ignore region it's a plain fp
    tp, fp = tpfp_default(det, gt, None, iou_thr=0.5)
    assert fp.sum() == 1


def test_eval_map_voc07_mode():
    ann = dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
               labels=np.array([0]))
    dets = [[np.array([[0, 0, 10, 10, 0.9]], np.float32)]]
    m_area, _ = eval_map(dets, [ann], iou_thr=0.5)
    m_11, _ = eval_map(dets, [ann], iou_thr=0.5, dataset='voc07')
    assert abs(m_area - 1.0) < 1e-6
    # 11-point AP of a perfect single detection is 1.0 too
    assert abs(m_11 - 1.0) < 1e-6


def test_voc_dataset_evaluate(tmp_path):
    # minimal VOC tree: 2 images, 1 class used, one difficult object
    import cv2
    (tmp_path / 'Annotations').mkdir()
    (tmp_path / 'JPEGImages').mkdir()
    (tmp_path / 'ImageSets' / 'Main').mkdir(parents=True)
    xml = """<annotation><size><width>64</width><height>64</height>
    <depth>3</depth></size>
    <object><name>car</name><difficult>{d}</difficult>
    <bndbox><xmin>{x}</xmin><ymin>10</ymin><xmax>{x2}</xmax>
    <ymax>30</ymax></bndbox></object></annotation>"""
    for i, (x, d) in enumerate([(5, 0), (20, 1)]):
        (tmp_path / 'Annotations' / f'im{i}.xml').write_text(
            xml.format(x=x, x2=x + 20, d=d))
        cv2.imwrite(str(tmp_path / 'JPEGImages' / f'im{i}.jpg'),
                    np.zeros((64, 64, 3), np.uint8))
    split = tmp_path / 'ImageSets' / 'Main' / 'test.txt'
    split.write_text('im0\nim1\n')

    from tpudet.data.custom import VOCDataset
    ds = VOCDataset(ann_file=str(split), img_prefix=str(tmp_path),
                    pipeline=[], test_mode=True)
    assert len(ds) == 2
    # image 1's object is difficult -> ignore set
    assert ds.data_infos[1]['ann']['bboxes'].shape[0] == 0
    assert ds.data_infos[1]['ann']['bboxes_ignore'].shape[0] == 1

    n_cls = len(VOCDataset.CLASSES)
    car = VOCDataset.CLASSES.index('car')
    empty = [np.zeros((0, 5), np.float32)] * n_cls

    def dets_for(box):
        out = list(empty)
        out[car] = np.array([list(box) + [0.9]], np.float32)
        return out

    results = [dets_for([5, 10, 25, 30]), dets_for([20, 10, 40, 30])]
    rep = ds.evaluate(results, metric='mAP', year='2007')
    # image0 perfect tp; image1's det hits only the ignored gt -> no fp
    assert abs(rep['mAP'] - 1.0) < 1e-6
    rep_r = ds.evaluate(results, metric='recall')
    assert rep_r['recall@100'] == 1.0

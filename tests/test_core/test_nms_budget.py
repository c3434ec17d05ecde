"""NMS candidate-budget exactness (VERDICT round-1 #2): the shipped
anchor_pre/nms_pre budgets must reproduce the exact uncapped detection
set on realistic + adversarial score distributions.

Full-scale (25200 anchors x 80 classes) results are committed in
docs/nms_budget_ablation.json (tools/nms_budget_ablation.py): the
shipped anchor_pre=2048/nms_pre=8192 is exact; round-1's 1024 budget
dropped up to 55/300 detections with scores up to 0.6.  This test runs
the same harness at reduced scale with the equivalent anchor fraction.
"""
import json
import os.path as osp

from tools.nms_budget_ablation import run_ablation


def test_budget_exact_at_equivalent_fraction():
    rep = run_ablation(num_anchors=6000, num_classes=20,
                       seeds=(0,), adversarial=(False, True),
                       budgets=((256, 2048, 0, 0), (1024, 4096, 0, 0),
                                (1024, -1, 256, 0), (1024, 0, 256, 4)))
    for case in rep['cases']:
        generous = case['budgets']['anchor1024_nms4096']
        assert generous['missing_dets'] == 0, case
        # per-class budget path
        per_class = case['budgets']['anchor1024_class256']
        assert per_class['missing_dets'] == 0, case
        # the shipped-default composite: lane preselect + per-class slice
        composite = case['budgets']['anchor1024_lane4_class256']
        assert composite['missing_dets'] == 0, case
        # the harness must actually DETECT budget-induced loss (the
        # too-small budget drops detections) — guards against a
        # trivially-passing comparator
        starved = case['budgets']['anchor256_nms2048']
        if not case['adversarial']:
            assert starved['missing_dets'] > 0


def test_committed_report_says_shipped_budgets_exact():
    path = osp.join(osp.dirname(osp.dirname(osp.dirname(
        osp.abspath(__file__)))), 'docs', 'nms_budget_ablation.json')
    with open(path) as f:
        rep = json.load(f)
    assert rep['num_anchors'] == 25200 and rep['num_classes'] == 80
    for case in rep['cases']:
        # shipped default: anchor_pre=2048 + lane4 preselect + class256
        shipped = case['budgets']['anchor2048_lane4_class256']
        assert shipped['missing_dets'] == 0, case
        # the per-class-only and flat nms_pre=8192 fallbacks stay exact
        assert case['budgets']['anchor2048_class256']['missing_dets'] == 0
        assert case['budgets']['anchor2048_nms8192']['missing_dets'] == 0


def test_graft_entry_matches_shipped_config():
    """The driver must bench the shipped test_cfg (VERDICT weak #2)."""
    from tpudet.config import Config
    root = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    shipped = Config.fromfile(
        osp.join(root, 'configs/yolov4/yolov4l_coco_mosaic.py'))
    tc = shipped['model']['test_cfg']
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'graft_entry', osp.join(root, '__graft_entry__.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    model = mod._flagship_model()
    assert model.test_cfg['anchor_pre'] == tc['anchor_pre']
    assert model.test_cfg['nms_pre'] == tc['nms_pre']
    assert model.test_cfg['score_thr'] == tc['score_thr']
    assert model.test_cfg['max_per_img'] == tc['max_per_img']

# CentripetalNet (reference configs/centripetalnet/
# centripetalnet_hourglass104_mstest_16x6_210e_coco.py).
_base_ = '../cornernet/cornernet_hourglass104_mstest_8x6_210e_coco.py'

model = dict(
    bbox_head=dict(_delete_=True, type='CentripetalHead', num_classes=80,
                   in_channels=256, num_feat_levels=2),
)

# GRoIE: Generic RoI Extractor aggregating all FPN levels
# (reference configs/groie/faster_rcnn_r50_fpn_groie_1x_coco.py:
#  GenericRoIExtractor with sum aggregation).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(roi_head=dict(roi_extractor='generic'))

from .single_stage import SingleStageDetector, YOLOV4, YOLOV5

__all__ = ['SingleStageDetector', 'YOLOV4', 'YOLOV5']

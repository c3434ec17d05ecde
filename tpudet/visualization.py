"""Detection visualization (reference mmdet/core/visualization analogue)."""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import cv2
import numpy as np


def imshow_det_bboxes(img: Union[str, np.ndarray],
                      result: List[np.ndarray],
                      class_names: Sequence[str],
                      score_thr: float = 0.3,
                      thickness: int = 2,
                      font_scale: float = 0.5,
                      out_file: Optional[str] = None) -> np.ndarray:
    """Draw per-class detection arrays onto the image (BGR)."""
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    img = np.ascontiguousarray(img)
    rng = np.random.RandomState(42)
    colors = {
        c: tuple(int(x) for x in rng.randint(0, 255, 3))
        for c in range(len(class_names))
    }
    for cls, dets in enumerate(result):
        for det in dets:
            if det[4] < score_thr:
                continue
            x1, y1, x2, y2 = (int(v) for v in det[:4])
            cv2.rectangle(img, (x1, y1), (x2, y2), colors[cls], thickness)
            label = f'{class_names[cls]}: {det[4]:.2f}'
            cv2.putText(img, label, (x1, max(y1 - 4, 0)),
                        cv2.FONT_HERSHEY_SIMPLEX, font_scale, colors[cls], 1)
    if out_file is not None:
        cv2.imwrite(out_file, img)
    return img

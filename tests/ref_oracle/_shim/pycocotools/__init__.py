# functional-subset pycocotools shim (mask RLE via numpy/cv2)

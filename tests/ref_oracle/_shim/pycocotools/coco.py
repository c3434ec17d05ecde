"""Functional COCO index (pycocotools.coco.COCO API subset)."""
import json
from collections import defaultdict


class COCO:
    def __init__(self, annotation_file=None):
        self.dataset = {}
        self.anns, self.cats, self.imgs = {}, {}, {}
        self.imgToAnns = defaultdict(list)
        self.catToImgs = defaultdict(list)
        if annotation_file is not None:
            with open(annotation_file) as f:
                self.dataset = json.load(f)
            self.createIndex()

    def createIndex(self):
        anns, cats, imgs = {}, {}, {}
        imgToAnns = defaultdict(list)
        catToImgs = defaultdict(list)
        for ann in self.dataset.get('annotations', []):
            imgToAnns[ann['image_id']].append(ann)
            anns[ann['id']] = ann
        for img in self.dataset.get('images', []):
            imgs[img['id']] = img
        for cat in self.dataset.get('categories', []):
            cats[cat['id']] = cat
        for ann in self.dataset.get('annotations', []):
            catToImgs[ann['category_id']].append(ann['image_id'])
        self.anns, self.cats, self.imgs = anns, cats, imgs
        self.imgToAnns = imgToAnns
        self.catToImgs = catToImgs

    def getAnnIds(self, imgIds=[], catIds=[], areaRng=[], iscrowd=None):
        imgIds = imgIds if isinstance(imgIds, (list, tuple)) else [imgIds]
        catIds = catIds if isinstance(catIds, (list, tuple)) else [catIds]
        if len(imgIds) == len(catIds) == len(areaRng) == 0:
            anns = self.dataset.get('annotations', [])
        else:
            if len(imgIds):
                anns = [a for i in imgIds for a in self.imgToAnns[i]]
            else:
                anns = self.dataset.get('annotations', [])
            if len(catIds):
                anns = [a for a in anns if a['category_id'] in catIds]
            if len(areaRng):
                anns = [a for a in anns
                        if areaRng[0] < a['area'] < areaRng[1]]
        if iscrowd is not None:
            return [a['id'] for a in anns if a.get('iscrowd', 0) == iscrowd]
        return [a['id'] for a in anns]

    def getCatIds(self, catNms=[], supNms=[], catIds=[]):
        catNms = catNms if isinstance(catNms, (list, tuple)) else [catNms]
        supNms = supNms if isinstance(supNms, (list, tuple)) else [supNms]
        catIds = catIds if isinstance(catIds, (list, tuple)) else [catIds]
        cats = self.dataset.get('categories', [])
        if len(catNms):
            cats = [c for c in cats if c['name'] in catNms]
        if len(supNms):
            cats = [c for c in cats if c.get('supercategory') in supNms]
        if len(catIds):
            cats = [c for c in cats if c['id'] in catIds]
        return [c['id'] for c in cats]

    def getImgIds(self, imgIds=[], catIds=[]):
        imgIds = imgIds if isinstance(imgIds, (list, tuple)) else [imgIds]
        catIds = catIds if isinstance(catIds, (list, tuple)) else [catIds]
        if len(imgIds) == len(catIds) == 0:
            return list(self.imgs.keys())
        ids = set(imgIds) if imgIds else set()
        for i, catId in enumerate(catIds):
            if i == 0 and len(ids) == 0:
                ids = set(self.catToImgs[catId])
            else:
                ids &= set(self.catToImgs[catId])
        return list(ids) if ids else list(self.imgs.keys() if not imgIds
                                          else imgIds)

    def loadAnns(self, ids=[]):
        if isinstance(ids, (list, tuple)):
            return [self.anns[i] for i in ids]
        return [self.anns[ids]]

    def loadCats(self, ids=[]):
        if isinstance(ids, (list, tuple)):
            return [self.cats[i] for i in ids]
        return [self.cats[ids]]

    def loadImgs(self, ids=[]):
        if isinstance(ids, (list, tuple)):
            return [self.imgs[i] for i in ids]
        return [self.imgs[ids]]

    def annToRLE(self, ann):
        from . import mask as maskUtils
        t = self.imgs[ann['image_id']]
        h, w = t['height'], t['width']
        segm = ann['segmentation']
        if isinstance(segm, list):
            rles = maskUtils.frPyObjects(segm, h, w)
            return maskUtils.merge(rles)
        if isinstance(segm['counts'], list):
            return maskUtils.frPyObjects(segm, h, w)
        return segm

    def annToMask(self, ann):
        from . import mask as maskUtils
        return maskUtils.decode(self.annToRLE(ann))

    def loadRes(self, resFile):
        import copy
        res = COCO()
        res.dataset['images'] = [img for img in
                                 self.dataset.get('images', [])]
        if isinstance(resFile, str):
            with open(resFile) as f:
                anns = json.load(f)
        else:
            anns = resFile
        res.dataset['categories'] = copy.deepcopy(
            self.dataset.get('categories', []))
        for i, ann in enumerate(anns):
            ann['id'] = i + 1
            bb = ann.get('bbox')
            if bb is not None and 'area' not in ann:
                ann['area'] = bb[2] * bb[3]
            ann.setdefault('iscrowd', 0)
        res.dataset['annotations'] = anns
        res.createIndex()
        return res

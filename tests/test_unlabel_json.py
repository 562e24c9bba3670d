import json

from ubteacher_tpu.data.coco import load_coco_unlabel_json


def test_load_unlabel_json(tmp_path):
    coco = {
        "images": [
            {"id": 7, "file_name": "b.jpg", "height": 100, "width": 200},
            {"id": 3, "file_name": "a.jpg", "height": 50, "width": 60},
        ]
    }
    p = tmp_path / "unlabeled.json"
    p.write_text(json.dumps(coco))
    dicts = load_coco_unlabel_json(str(p), "/root/imgs")
    # sorted by image id (reference: datasets/builtin.py:82 sorted ids)
    assert [d["image_id"] for d in dicts] == [3, 7]
    assert dicts[0]["file_name"] == "/root/imgs/a.jpg"
    assert dicts[0]["annotations"] == []
    assert dicts[1]["height"] == 100

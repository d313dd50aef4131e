"""Reference-style option file loading."""

import textwrap


def test_load_reference_options(tmp_path):
    from phnet_tpu.utils.config_compat import load_reference_options

    opt = tmp_path / "my_options.py"
    opt.write_text(textwrap.dedent("""
        img_h = 320
        img_w = 640
        trainset = ['VIL100']
        root = './my_dataset'
        sampled_frames = 8
        max_skip = [4]
        samples_per_video = 3
        epochs = 30
        train_batch = 1
        learning_rate = 1e-3
        momentum = (0.9, 0.99)
        solver = 'adamW'
        weight_decay = 2e-3
        epochs_per_increment = 4
        epoch_per_test = 2
        num_points = 36
        n_offsets = 36
        max_lanes = 6
        cut_scale = 0.3
        neck = dict(in_channels=[128, 256, 512], out_channels=48, num_outs=3)
        cls_weight = 3.0
        reg_weight = 0.7
        iou_weight = 1.2
        test_parameters = dict(conf_threshold=0.55, nms_thres=40, nms_topk=6)
        my_custom_knob = 42
    """))
    cfg, unmapped = load_reference_options(str(opt))
    m, t = cfg.model, cfg.train
    assert (m.img_h, m.img_w) == (320, 640)
    assert m.lane.n_offsets == 36 and m.lane.n_lengths == 2  # VIL family
    assert m.max_lanes == 6 and m.cut_scale == 0.3
    assert m.neck.out_channels == 48
    assert m.test.conf_threshold == 0.55 and m.test.nms_topk == 6
    assert t.epochs == 30 and t.learning_rate == 1e-3
    assert t.momentum == (0.9, 0.99) and t.max_skip == 4
    assert t.loss.cls_weight == 3.0 and t.loss.iou_weight == 1.2
    assert cfg.data.root == "./my_dataset"
    assert "my_custom_knob" in unmapped


def test_load_openlane_options(tmp_path):
    from phnet_tpu.utils.config_compat import load_reference_options

    opt = tmp_path / "ol_options.py"
    opt.write_text(
        "trainset = ['OpenLane']\n"
        "num_points = 72\nmax_lanes = 4\nnum_priors = 192\n"
        "save_freq_max = 7\n"
        "test_parameters = dict(conf_threshold=0.5, nms_thres=50, nms_topk=4)\n"
    )
    cfg, _ = load_reference_options(str(opt))
    assert cfg.model.lane.n_lengths == 1  # OL layout
    assert cfg.model.lane.n_offsets == 72
    assert cfg.model.head.num_priors == 192
    assert cfg.model.memory.window == 7
    assert cfg.model.routing == "soft"

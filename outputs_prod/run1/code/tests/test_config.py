import os
import textwrap

import pytest

from garmentdreamer_tpu.core.config import C, C_max, Config, load_config, parse_dotlist


def test_attribute_access_nested():
    cfg = Config({"a": {"b": {"c": 3}}, "lst": [{"x": 1}]})
    assert cfg.a.b.c == 3
    assert cfg.lst[0].x == 1
    cfg.a.b.c = 7
    assert cfg["a"]["b"]["c"] == 7


def test_dotlist_parsing_types():
    cfg = parse_dotlist(["a.b=1e-3", "a.c=true", "d=[1,2,3]", "e=hello", "f=null"])
    assert cfg.a.b == pytest.approx(1e-3)
    assert cfg.a.c is True
    assert cfg.d == [1, 2, 3]
    assert cfg.e == "hello"
    assert cfg.f is None


def test_yaml_interpolation_and_resolvers(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        textwrap.dedent(
            """
            name: "run"
            tag: "${rmspace:${system.prompt},_}"
            exp_root_dir: "outputs"
            data:
              eval_camera_distance: 3.5
            system:
              prompt: "a blue denim tee"
              radius: ${data.eval_camera_distance}
              scale: 0.5
            """
        )
    )
    cfg = load_config(str(p), cli_overrides=["system.scale=0.4"], timestamp="@t")
    assert cfg.system.radius == 3.5
    assert cfg.tag == "a_blue_denim_tee"
    assert cfg.system.scale == 0.4
    assert cfg.trial_dir == os.path.join("outputs", "a_blue_denim_tee@t")


def test_C_schedule_semantics():
    # plain scalars pass through
    assert C(5, 0, 0) == 5.0
    # [start_step, start, end, end_step] with int end_step -> step interp
    # the reference grad_clip schedule: [0, 1.5, 2.0, 1000]
    assert C([0, 1.5, 2.0, 1000], epoch=0, global_step=0) == pytest.approx(1.5)
    assert C([0, 1.5, 2.0, 1000], epoch=0, global_step=500) == pytest.approx(1.75)
    assert C([0, 1.5, 2.0, 1000], epoch=0, global_step=5000) == pytest.approx(2.0)
    # 3-list means start_step=0
    assert C([1.0, 2.0, 10], epoch=0, global_step=5) == pytest.approx(1.5)
    # float end_step -> epoch interp
    assert C([0, 0.0, 1.0, 10.0], epoch=5, global_step=99999) == pytest.approx(0.5)


def test_C_max():
    assert C_max(3) == 3.0
    assert C_max([0, 1.5, 2.0, 1000]) == 2.0
    assert C_max([2.0, 0.5, 100]) == 2.0


def test_merge_precedence(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nb: {c: 2}\n")
    cfg = load_config(str(p), cli_overrides=["b.c=3"], a=10)
    assert cfg.a == 10  # kwargs beat CLI beat yaml
    assert cfg.b.c == 3

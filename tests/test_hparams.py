import pytest

from ultra_pytorch_tpu.utils.hparams import HParams


def test_scalar_parse():
    hp = HParams(learning_rate=0.05, steps=10, name="adam", flag=False)
    hp.parse("learning_rate=0.1,steps=20,name=sgd,flag=true")
    assert hp.learning_rate == 0.1
    assert hp.steps == 20
    assert hp.name == "sgd"
    assert hp.flag is True


def test_list_parse():
    hp = HParams(hidden_layer_sizes=[512, 256, 128], taus=[0.1])
    hp.parse("hidden_layer_sizes=[64, 32],taus=[0.5,0.25]")
    assert hp.hidden_layer_sizes == [64, 32]
    assert hp.taus == [0.5, 0.25]


def test_indexed_assignment():
    hp = HParams(sizes=[1, 2, 3])
    hp.parse("sizes[1]=9")
    assert hp.sizes == [1, 9, 3]


def test_unknown_raises():
    hp = HParams(a=1)
    with pytest.raises(ValueError):
        hp.parse("b=2")


def test_int_promotion_rules():
    hp = HParams(x=1.0)
    hp.parse("x=2")
    assert hp.x == 2.0
    hp2 = HParams(y=1)
    with pytest.raises(ValueError):
        hp2.parse("y=2.5")


def test_empty_and_mixed():
    hp = HParams(a=1, b="x")
    hp.parse("")
    assert hp.a == 1
    hp.parse("a=3,b=hello")
    assert (hp.a, hp.b) == (3, "hello")

"""Config tree + loader tests."""
import numpy as np
import pytest
import os

from lidarreg.utils.config import Config, get_config
from lidarreg.data import default_balanced_root

HAVE_SETS = os.path.isdir(default_balanced_root())


class TestConfig:
    def test_dataset_family_defaults(self):
        k = get_config("K")
        assert k.eval.inlier_threshold == 1.2
        assert k.eval.te_thre == 60.0
        assert k.data.downsample == 0.3
        m = get_config("3DMatch")
        assert m.eval.inlier_threshold == 0.10
        assert m.eval.re_thre == 15.0
        assert m.data.downsample == 0.03

    def test_json_roundtrip(self, tmp_path):
        cfg = get_config("A")
        cfg.ransac.iters = 123456
        cfg.net.num_layers = 7
        p = str(tmp_path / "config.json")
        cfg.save(p)
        back = Config.load(p)
        assert back.ransac.iters == 123456
        assert back.net.num_layers == 7
        assert back.data.dataset == "ApolloSouthbay"


class TestLoader:
    def test_inf_sampler_sharding(self):
        from lidarreg.data.loader import InfSampler

        s0 = InfSampler(10, shuffle=False, rank=0, world_size=2)
        s1 = InfSampler(10, shuffle=False, rank=1, world_size=2)
        a = [next(s0) for _ in range(5)]
        b = [next(s1) for _ in range(5)]
        assert sorted(a + b) == list(range(10))
        # infinite: wraps around
        assert [next(s0) for _ in range(5)] == a

    def test_inf_sampler_shuffle_deterministic(self):
        from lidarreg.data.loader import InfSampler

        a = [next(InfSampler(20, seed=3)) for _ in range(1)]
        b = [next(InfSampler(20, seed=3)) for _ in range(1)]
        assert a == b

    @pytest.mark.skipif(not HAVE_SETS, reason="balanced sets not mounted")
    def test_make_data_loader(self):
        from lidarreg.data.loader import make_data_loader

        ds, it = make_data_loader("K", phase="validation", batch_size=3)
        idxs = next(it)
        assert len(idxs) == 3
        T, a, b = ds.get_pair(idxs[0])
        assert T.shape == (4, 4)

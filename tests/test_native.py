"""Native C++ max-clique tests (exact PMC replacement)."""
import numpy as np
import itertools

from lidarreg.native import max_clique


def brute_force_max_clique(adj):
    n = adj.shape[0]
    best = []
    for r in range(n, 0, -1):
        for combo in itertools.combinations(range(n), r):
            if all(adj[a, b] for a, b in itertools.combinations(combo, 2)):
                return list(combo)
    return best


class TestMaxClique:
    def test_matches_bruteforce_small(self, rng):
        for trial in range(10):
            n = 12
            adj = rng.uniform(size=(n, n)) < 0.5
            adj = adj | adj.T
            np.fill_diagonal(adj, False)
            got = max_clique(adj)
            exp = brute_force_max_clique(adj)
            assert len(got) == len(exp), f"trial {trial}: {got} vs {exp}"
            assert all(adj[a, b] for a, b in itertools.combinations(got, 2))

    def test_planted_clique(self, rng):
        n = 200
        adj = rng.uniform(size=(n, n)) < 0.1
        adj = adj | adj.T
        members = rng.choice(n, 20, replace=False)
        adj[np.ix_(members, members)] = True
        np.fill_diagonal(adj, False)
        got = max_clique(adj)
        assert set(members) <= set(got.tolist()) or len(got) >= 20

    def test_empty_graph(self):
        adj = np.zeros((5, 5), bool)
        got = max_clique(adj)
        assert len(got) == 1  # single vertex is a clique

    def test_complete_graph(self):
        n = 30
        adj = np.ones((n, n), bool)
        np.fill_diagonal(adj, False)
        got = max_clique(adj)
        assert len(got) == n

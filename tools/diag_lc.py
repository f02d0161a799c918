"""Loop-closure diagnostic on the out-and-back metric-scale scenario.

Prints the tf-idf likelihood trace per full node (best candidate, value,
threshold) to show why loop closures do or don't fire
(tests/test_metric_scale.py; VERDICT r3 item 3).  CPU-runnable.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    n_forward = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    from tpuslam.io.synthetic import make_sequence, out_and_back_trajectory
    from tpuslam.config import SlamConfig
    from tpuslam.mapping.mapper import Mapper

    d = os.environ.get("DIAG_SEQ") or tempfile.mkdtemp(prefix="lcdiag")
    if not os.path.exists(os.path.join(d, "calib.txt")):
        poses = out_and_back_trajectory(n_forward=n_forward, speed=1.0)
        make_sequence(d, poses=poses, width=320, height=240,
                      f=260.0, baseline=0.54, seed=13)
        print(f"# sequence at {d}")

    orig = Mapper._dictionary_and_loop_closure

    def traced(self, node):
        self._add_word_ids(node)
        if node.weight < 0 or not self.working_mem:
            print(f"node {node.id:3d}: wm empty")
            return None
        candidates = [i for i in self.working_mem
                      if self.nodes[i].weight != -1]
        lik = self.compute_likelihood(node, candidates)
        top = sorted(lik.items(), key=lambda kv: -kv[1])[:3]
        print(f"node {node.id:3d}: wm={len(candidates)} "
              f"dict={len(self.vwd)} top=" +
              " ".join(f"({i}:{v:.3f})" for i, v in top))
        best_id, best_val = 0, 0.0
        for nid, val in lik.items():
            if nid > 0 and val > best_val:
                best_id, best_val = nid, val
        if best_val < self.cfg.loop_thr:
            return None
        from tpuslam.vo.registration import compute_transform
        from tpuslam.geometry import transform as T
        from tpuslam.mapping.graph import Link, LOOP_CLOSURE
        tf, reg = compute_transform(
            self.nodes[best_id].frame, node.frame, None, self.camera,
            nndr=self.matching_cfg.nndr,
            min_inliers=self.pnp_cfg.min_inliers,
            refine_iterations=self.pnp_cfg.refine_iterations,
            seed=node.id)
        if tf is None:
            print(f"  -> LC transform REJECTED ({node.id},{best_id})")
            return None
        print(f"  -> LC ACCEPTED ({node.id},{best_id}) val={best_val:.3f}")
        tf = T.inverse(tf)
        information = np.linalg.inv(reg.covariance)
        self.loop_closures.append((node.id, best_id))
        return Link(node.id, best_id, LOOP_CLOSURE, tf, information)

    Mapper._dictionary_and_loop_closure = traced

    from tpuslam.cli.slam_batch import run
    result = run(d, cfg=SlamConfig(), quiet=True)
    print(f"# n_lc={result['n_loop_closures']} "
          f"t_err={result.get('t_err_pct', float('nan')):.3f}% "
          f"ate={result.get('ate_m', float('nan')):.3f}m "
          f"r_err={result.get('r_err_deg_per_m', float('nan')):.6f}")
    lost = int(np.sum([0]))
    print("# done")


if __name__ == "__main__":
    main()

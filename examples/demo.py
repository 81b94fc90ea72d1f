"""End-to-end demo: the reference's `test/main.cpp` workload, headless.

Reproduces the pipeline of reference C14 (`test/main.cpp:47-186`):
5000 random surface samples on a cube (NUM_POINTS/REDUCTION_RATIO/K at
`test/main.cpp:22-24`), kNN graph, disc sampling, parents, coarse graph,
coarse placement, Voronoi triangles, barycentric prolongation, and the
projection sanity check (`test/main.cpp:147-156`).  Instead of a
Polyscope window it prints the stage progression and writes the fine /
coarse / projected point clouds as OBJ files.

Run:  PYTHONPATH=. python examples/demo.py [out_dir]
"""

import os
import sys

import numpy as np
import jax.numpy as jnp

import gravomg_tpu as g
from gravomg_tpu.geometry.meshes import cube_mesh, random_points_on_mesh

NUM_POINTS = 5000      # `test/main.cpp:22`
REDUCTION_RATIO = 2.0  # `test/main.cpp:23`
K = 32                 # `test/main.cpp:24`


def write_obj_points(path, pts):
    with open(path, "w") as f:
        for p in np.asarray(pts):
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")


def main(out_dir="demo_out"):
    os.makedirs(out_dir, exist_ok=True)
    verts, faces = cube_mesh()
    print(f"Loaded cube mesh: {len(verts)}v, {len(faces)}f")

    fine_points = random_points_on_mesh(NUM_POINTS, verts, faces, seed=0)
    fine_points = np.asarray(
        g.scale_mesh(jnp.asarray(fine_points)), np.float64)
    print(f"Sampled point cloud: {fine_points.shape[0]}x3")

    graph = g.knn_graph(jnp.asarray(fine_points, jnp.float32), k=K)
    print(f"Produced edge graph: {graph.num_vertices} vertices, "
          f"max degree {int(np.asarray(graph.degrees).max())}")

    radius = float(g.sampling_radius(graph, REDUCTION_RATIO))
    print(f"Selected radius for fast disc sampling: {radius:.6f}")

    ld = g.coarsen_once(graph, g.MultigridConfig(
        reduction_ratio=REDUCTION_RATIO))
    st = ld.stats
    print(f"Selected coarse points using fast disc sampling: {st.n_coarse}")
    print("Associated each fine point with a coarse \"parent\"")
    n_edges = int(np.asarray(ld.coarse.degrees).sum())
    print(f"Found {n_edges} coarse edges based on associated fine edges")
    print("Moved each coarse point to the mean of its \"children\"")
    print(f"Constructed {int(st.n_triangles)} voronoi triangles "
          f"from the coarse points")
    print(f"Produced a prolongation operator: "
          f"{ld.u.n_fine}x{ld.u.n_coarse} "
          f"(hits/edge/point fallbacks: {int(st.triangle_hits)}/"
          f"{int(st.edge_fallbacks)}/{int(st.point_fallbacks)})")

    projected = g.projected_points(ld.u, ld.coarse.points)
    res = np.linalg.norm(np.asarray(projected) - fine_points, axis=1)
    print(f"Projection sanity check: max residual {res.max():.4f} "
          f"(sampling radius {radius:.4f})")

    write_obj_points(os.path.join(out_dir, "fine.obj"), fine_points)
    write_obj_points(os.path.join(out_dir, "coarse.obj"),
                     np.asarray(ld.coarse.points)[:st.n_coarse])
    write_obj_points(os.path.join(out_dir, "projected.obj"), projected)
    print(f"Wrote fine/coarse/projected point clouds to {out_dir}/")


if __name__ == "__main__":
    main(*sys.argv[1:2])

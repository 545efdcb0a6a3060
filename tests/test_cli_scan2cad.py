"""End-to-end test of the splat-re-ranking CLI on synthetic data
(PLY meshes + chamfer cache + full retrieval pipeline)."""

import os

import numpy as np
import pytest

from tests.synthetic_data import CATID, build_tree


def write_cube_ply(path, center, size=1.0, binary=False):
    c = np.asarray(center, float)
    s = size / 2
    verts = np.array([
        [x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)
    ]) + c
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if binary:
        import struct
        with open(path, "wb") as f:
            hdr = (
                "ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(verts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                f"element face {len(faces)}\n"
                "property list uchar int vertex_indices\nend_header\n"
            )
            f.write(hdr.encode())
            f.write(verts.astype("<f4").tobytes())
            for tri in faces:
                f.write(struct.pack("<B3i", 3, *tri))
    else:
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(verts)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write(f"element face {len(faces)}\n")
            f.write("property list uchar int vertex_indices\nend_header\n")
            for v in verts:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
            for tri in faces:
                f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")


class TestPlyReader:
    def test_ascii_and_binary(self, tmp_path):
        from corsair_tpu.data.cad_lib import read_ply_mesh, sample_mesh_uniform

        pa = str(tmp_path / "a.ply")
        pb = str(tmp_path / "b.ply")
        write_cube_ply(pa, [1, 2, 3], binary=False)
        write_cube_ply(pb, [1, 2, 3], binary=True)
        va, fa = read_ply_mesh(pa)
        vb, fb = read_ply_mesh(pb)
        np.testing.assert_allclose(va, vb, atol=1e-6)
        np.testing.assert_array_equal(fa, fb)
        assert va.shape == (8, 3) and fa.shape == (12, 3)
        pts = sample_mesh_uniform(va, fa, 500)
        assert pts.shape == (500, 3)
        # all samples on the cube surface
        d = np.abs(pts - [1, 2, 3])
        assert np.isclose(d.max(axis=1), 0.5, atol=1e-6).all()


class TestScan2cadCLI:
    def test_rerank_pipeline(self, tmp_path_factory, rng):
        from corsair_tpu.cli.evaluation_scan2cad import App, Config

        root = str(tmp_path_factory.mktemp("scan2cad_cli"))
        tree = build_tree(root)

        # RaDe-GS recon meshes: one cube per model
        radegs = os.path.join(root, "RaDe-GS")
        for i, mid in enumerate(tree["model_ids"]):
            write_cube_ply(
                os.path.join(radegs, CATID, mid, "recon.ply"),
                center=[i * 2.0, 0, 0], size=1.0, binary=(i % 2 == 0),
            )
        # chamfer cache csv (n x n row-major)
        n = len(tree["model_ids"])
        cache = rng.rand(n, n)
        csv_path = os.path.join(root, "chamfer_dist_list.csv")
        with open(csv_path, "w") as f:
            f.write("chamfer_dist\n")
            for v in cache.flatten():
                f.write(f"{v}\n")

        config = Config(
            shapenet_pc15k_root=tree["shapenet_root"],
            scan2cad_pc_root=tree["scan_root"],
            scan2cad_annotation_root=tree["annotation_root"],
            shapenet_radegs_root=radegs,
            category="chair",
            checkpoint="",
            cache_dir="",
            voxel_size=0.05,
            batch_size=4,
            config_dir=tree["config_dir"],
            use_best=3,
        )
        app = App(config)
        app.extract_library()
        app.extract_scans()
        app.eval_retrieval()
        cds = app.rerank_and_eval(chamfer_cache_csv=csv_path)
        assert len(cds) == 3
        assert all(np.isfinite(c) for c in cds)
        results_path = str(tmp_path_factory.mktemp("out") / "results")
        app.write_results(results_path)
        with open(results_path) as f:
            assert len(f.readlines()) == 3

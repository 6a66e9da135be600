"""Mesh extraction tests: sphere iso-surface sanity."""
import numpy as np

from sparsefusion_tpu.render.mesh import export_mesh, marching_tetrahedra


def test_sphere_surface():
    n = 32
    xs = np.linspace(-1, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    values = 1.0 - np.linalg.norm(g, axis=-1)  # iso 0.5 -> radius 0.5
    verts, faces = marching_tetrahedra(
        values, 0.5, origin=np.array([-1.0, -1.0, -1.0]),
        spacing=np.full(3, xs[1] - xs[0]))
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.02)
    assert r.std() < 0.02
    # faces index valid vertices
    assert faces.max() < len(verts) and faces.min() >= 0


def test_export_mesh_obj(tmp_path):
    import jax.numpy as jnp

    def field(x):
        return 20.0 * (0.6 - jnp.linalg.norm(x, axis=-1))

    path = str(tmp_path / "mesh.obj")
    verts, faces = export_mesh(field, path, bound=1.0, resolution=24,
                               density_thresh=2.0)
    assert len(verts) > 50
    text = (tmp_path / "mesh.obj").read_text()
    assert text.count("\nf ") + text.startswith("f ") == len(faces)

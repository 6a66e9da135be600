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


def test_export_mesh_textured(tmp_path):
    import jax.numpy as jnp

    def field(x):
        return 20.0 * (0.6 - jnp.linalg.norm(x, axis=-1))

    def color(x):
        # position-dependent albedo so the bake is checkable
        return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)

    from sparsefusion_tpu.render.mesh import export_mesh_textured

    base = str(tmp_path / "tex")
    verts, faces, tex = export_mesh_textured(
        field, color, base + ".obj", bound=1.0, resolution=20,
        density_thresh=2.0, block=4)
    assert len(faces) > 50
    assert tex is not None and tex.ndim == 3 and tex.shape[2] == 3
    # all three files of the textured contract exist
    for ext in (".obj", ".mtl", ".png"):
        assert (tmp_path / ("tex" + ext)).exists(), ext
    text = (tmp_path / "tex.obj").read_text()
    assert "mtllib tex.mtl" in text
    assert text.count("\nvt ") == 3 * len(faces)
    # baked colors match the color fn at the face centroids
    centroids = verts[faces].mean(axis=1)
    expect = np.clip(centroids * 0.5 + 0.5, 0, 1)
    # look up the texel at each face's uv centroid
    import re

    uvs = np.array(re.findall(r"\nvt ([\d.e+-]+) ([\d.e+-]+)", text),
                   np.float64).reshape(len(faces), 3, 2)
    uvc = uvs.mean(axis=1)
    A = tex.shape[0]
    px = np.clip((uvc[:, 0] * A).astype(int), 0, A - 1)
    py = np.clip((uvc[:, 1] * A).astype(int), 0, A - 1)
    got = tex[py, px]
    err = np.abs(got - expect).mean()
    assert err < 0.08, err

from .mesh import MeshRunner, get_default_mesh  # noqa: F401

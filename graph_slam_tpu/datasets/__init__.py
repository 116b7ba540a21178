from .synthetic import make_sphere_graph, sphere_ground_truth

__all__ = ["make_sphere_graph", "sphere_ground_truth"]

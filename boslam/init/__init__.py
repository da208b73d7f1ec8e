from boslam.init.triangulation import triangulate_landmarks

__all__ = ["triangulate_landmarks"]

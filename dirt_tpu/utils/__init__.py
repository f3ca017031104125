"""Utilities: procedural meshes, texture sampling."""

from . import meshes, profiling, textures

__all__ = ["meshes", "profiling", "textures"]

"""Utilities: procedural meshes, texture sampling."""

from . import meshes, textures

__all__ = ["meshes", "textures"]

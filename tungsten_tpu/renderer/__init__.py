from .render import render_scene, render_flat

"""Blender camera ground-truth exporter (run INSIDE Blender).

Functional equivalent of the reference's GT export
(/root/reference/scripts/blender_ground_truth.py behavior): writes one CSV
row per animation frame with the schema consumed by
``ofps_tpu.apps.gt.load_ground_truth``::

    frame,fov_x,fov_y,rot_w,rot_i,rot_j,rot_k,pos_x,pos_y,pos_z

Rotations and positions are **rebased to the first frame** (frame 1 is the
identity pose) and remapped from Blender's camera axes to the codebase
convention: a Blender camera quaternion ``(w, x, y, z)`` becomes
``(w, x, -z, y)`` (Blender looks down -Z with +Y up; the pipeline's screen
space is Z-up / Y-forward — ofps/src/camera.rs:89-96).

Usage:  blender scene.blend --background --python blender_ground_truth.py \
            -- output.csv [CameraName]
"""

import csv
import math
import sys

import bpy  # type: ignore


def main():
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    out_path = argv[0] if argv else "ground_truth.csv"
    cam_name = argv[1] if len(argv) > 1 else None

    scene = bpy.context.scene
    cam_obj = bpy.data.objects[cam_name] if cam_name else scene.camera
    cam = cam_obj.data

    rows = []
    base_rot = None
    base_pos = None
    for frame in range(scene.frame_start, scene.frame_end + 1):
        scene.frame_set(frame)
        mw = cam_obj.matrix_world
        rot = mw.to_quaternion()
        pos = mw.to_translation()
        if base_rot is None:
            base_rot = rot.copy()
            base_pos = pos.copy()
        # Rebase to the first frame.
        rel_rot = base_rot.rotation_difference(rot)
        rel_pos = base_rot.conjugated() @ (pos - base_pos)

        # Axis remap Blender -> codebase: (x, y, z) -> (x, -z, y).
        w, x, y, z = rel_rot.w, rel_rot.x, rel_rot.y, rel_rot.z
        q = (w, x, -z, y)
        p = (rel_pos.x, -rel_pos.z, rel_pos.y)

        # FOV: Blender stores a single angle along the sensor fit axis.
        render = scene.render
        aspect = (render.resolution_x * render.pixel_aspect_x) / (
            render.resolution_y * render.pixel_aspect_y
        )
        if cam.sensor_fit == "VERTICAL":
            fov_y = cam.angle
            fov_x = 2 * math.atan(math.tan(fov_y / 2) * aspect)
        else:
            fov_x = cam.angle
            fov_y = 2 * math.atan(math.tan(fov_x / 2) / aspect)

        rows.append(
            [
                frame - scene.frame_start + 1,
                math.degrees(fov_x),
                math.degrees(fov_y),
                *q,
                *p,
            ]
        )

    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            "frame fov_x fov_y rot_w rot_i rot_j rot_k pos_x pos_y pos_z".split()
        )
        w.writerows(rows)
    print(f"wrote {len(rows)} ground-truth rows to {out_path}")


if __name__ == "__main__":
    main()

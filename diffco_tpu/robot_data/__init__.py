"""Self-generated robot description assets.

The upstream robot packages (Franka, KUKA, ...) are third-party data the
framework reads from DIFFCO_ROBOT_DATA; this package holds descriptions we
generate ourselves (e.g. the N-link rope — the reference ships a broken
1-link rope.urdf, rope_description/rope.urdf references a nonexistent
link2)."""
import os

data_dir = os.path.dirname(os.path.abspath(__file__))


def generate_rope_urdf(n_links: int = 20, link_length: float = 0.05,
                       radius: float = 0.01, path: str = None) -> str:
    """Write an N-link rope URDF: continuous joints alternating y/x axes
    (a discretized rope, ~n_links DOF). Returns the file path."""
    parts = ['<?xml version="1.0"?>', '<robot name="rope_robot">']
    parts.append('<link name="base"/>')
    for i in range(1, n_links + 1):
        parts.append(
            f'<link name="link{i}">\n'
            f'  <collision>\n'
            f'    <origin xyz="0 0 {link_length / 2}" rpy="0 0 0"/>\n'
            f'    <geometry><cylinder length="{link_length}" '
            f'radius="{radius}"/></geometry>\n'
            f'  </collision>\n'
            f'</link>')
        parent = 'base' if i == 1 else f'link{i - 1}'
        z = 0.0 if i == 1 else link_length
        axis = '0 1 0' if i % 2 else '1 0 0'
        parts.append(
            f'<joint name="joint{i}" type="continuous">\n'
            f'  <origin xyz="0 0 {z}" rpy="0 0 0"/>\n'
            f'  <parent link="{parent}"/>\n'
            f'  <child link="link{i}"/>\n'
            f'  <axis xyz="{axis}"/>\n'
            f'</joint>')
    parts.append('</robot>')
    if path is None:
        path = os.path.join(data_dir, f'rope_{n_links}.urdf')
    with open(path, 'w') as f:
        f.write('\n'.join(parts))
    return path

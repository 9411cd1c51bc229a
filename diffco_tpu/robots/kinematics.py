"""Flattened-chain forward kinematics (TPU-native).

Replaces the reference's recursive dict-of-CoordinateTransform FK
(/root/reference/diffco/collision_interfaces/rigid_body.py:82-140 and
urdf_interface.py:516-553) with a *static, topologically-sorted array
program*: per-link constant data lives in numpy arrays baked into the trace,
and FK is an unrolled compose of (R, t) pairs — fully jit/vmap/grad-safe,
no Python dictionaries or recursion on the hot path.

Conventions:
  * links are topologically sorted: ``parent[i] < i``, root has parent -1;
  * each link's joint connects it to its parent; fixed links use the fixed
    origin transform only;
  * revolute joints rotate about an arbitrary unit axis (general Rodrigues
    form — the reference only supported axis-aligned axes);
  * mimic joints read another joint's dof and apply ``mult * q + offset``
    (ref: rigid_body.py:91-92).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import axis_angle_mat, matmul_f32

FIXED, REVOLUTE, PRISMATIC = 0, 1, 2


@dataclasses.dataclass(frozen=True)
class ChainSpec:
    """Static (trace-time constant) description of a kinematic chain."""
    link_names: Tuple[str, ...]
    parent: np.ndarray          # int [L], parent[i] < i, root = -1
    jtype: np.ndarray           # int [L] in {FIXED, REVOLUTE, PRISMATIC}
    axis: np.ndarray            # float [L, 3] unit joint axes
    fixed_rot: np.ndarray       # float [L, 3, 3] joint origin rotation
    fixed_trans: np.ndarray     # float [L, 3] joint origin translation
    dof_idx: np.ndarray         # int [L], -1 for fixed links
    mimic_mult: np.ndarray      # float [L]
    mimic_offset: np.ndarray    # float [L]
    joint_limits: np.ndarray    # float [n_dofs, 2]
    joint_names: Tuple[str, ...] = ()
    # collision geometry: per-link list of (origin 4x4, shape descriptor)
    collision_origins: Tuple[Tuple[np.ndarray, ...], ...] = ()

    @property
    def n_links(self) -> int:
        return len(self.link_names)

    @property
    def n_dofs(self) -> int:
        return int(self.dof_idx.max()) + 1 if (self.dof_idx >= 0).any() else 0

    def link_index(self, name: str) -> int:
        return self.link_names.index(name)

    @property
    def unique_position_link_names(self) -> Tuple[str, ...]:
        """Links whose joint origin has a nonzero translation — the control
        points used by ForwardKinematicsDiffCo (ref:
        collision_checkers.py:356-358)."""
        return tuple(
            n for n, t in zip(self.link_names, self.fixed_trans)
            if np.any(t != 0))


def fk_link_poses(spec: ChainSpec, q: jnp.ndarray,
                  base_rot: Optional[jnp.ndarray] = None,
                  base_trans: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FK for a single configuration.

    q: [n_dofs] -> (rot [L, 3, 3], trans [L, 3]) world poses of link frames.
    Batch by ``jax.vmap``. The per-link loop unrolls at trace time (L is
    small); XLA fuses the chain of 3x3 matmuls.
    """
    q = jnp.asarray(q)
    dtype = q.dtype
    rots: List[jnp.ndarray] = []
    trans: List[jnp.ndarray] = []
    for i in range(spec.n_links):
        f_rot = jnp.asarray(spec.fixed_rot[i], dtype=dtype)
        f_trans = jnp.asarray(spec.fixed_trans[i], dtype=dtype)
        jt = int(spec.jtype[i])
        if jt == FIXED:
            j_rot, j_trans = f_rot, f_trans
        else:
            qi = q[int(spec.dof_idx[i])] * spec.mimic_mult[i] + spec.mimic_offset[i]
            if jt == REVOLUTE:
                j_rot = matmul_f32(f_rot, axis_angle_mat(
                    jnp.asarray(spec.axis[i], dtype=dtype), qi))
                j_trans = f_trans
            else:  # PRISMATIC: translate along the (rotated) axis
                j_rot = f_rot
                j_trans = f_trans + f_rot @ (
                    jnp.asarray(spec.axis[i], dtype=dtype) * qi)
        p = int(spec.parent[i])
        if p < 0:
            w_rot, w_trans = j_rot, j_trans
        else:
            w_rot = matmul_f32(rots[p], j_rot)
            w_trans = trans[p] + matmul_f32(rots[p], j_trans)
        rots.append(w_rot)
        trans.append(w_trans)
    rot = jnp.stack(rots)
    tr = jnp.stack(trans)
    if base_rot is not None:
        tr = jnp.einsum('ij,lj->li', base_rot, tr,
                        precision='highest') + base_trans
        rot = jnp.einsum('ij,ljk->lik', base_rot, rot, precision='highest')
    return rot, tr


def fk_link_poses_scan(spec: ChainSpec, q: jnp.ndarray,
                       base_rot: Optional[jnp.ndarray] = None,
                       base_trans: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FK via ``lax.scan`` over links — O(1) compile time in chain length.

    Identical semantics to :func:`fk_link_poses` (which unrolls the chain
    into the trace: better runtime fusion for short chains, but compile
    time grows with L). All per-joint local transforms are computed
    vectorized over L up front; the scan only composes poses down the
    topologically-sorted chain.
    """
    q = jnp.asarray(q)
    dtype = q.dtype
    L = spec.n_links
    fixed_rot = jnp.asarray(spec.fixed_rot, dtype)
    fixed_trans = jnp.asarray(spec.fixed_trans, dtype)
    axis = jnp.asarray(spec.axis, dtype)
    parent = jnp.asarray(spec.parent)
    jtype = jnp.asarray(spec.jtype)
    dof_idx = jnp.asarray(np.maximum(spec.dof_idx, 0))
    has_dof = jnp.asarray(spec.dof_idx >= 0)
    mult = jnp.asarray(spec.mimic_mult, dtype)
    off = jnp.asarray(spec.mimic_offset, dtype)

    qpad = jnp.concatenate([q, jnp.zeros(1, dtype)]) if spec.n_dofs == 0 \
        else q
    theta = jnp.where(has_dof, qpad[dof_idx] * mult + off, 0.0)  # [L]
    aa = axis_angle_mat(axis, theta)                              # [L, 3, 3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (L, 3, 3))
    rot_j = jnp.where((jtype == REVOLUTE)[:, None, None], aa, eye)
    j_rot = jnp.einsum('lij,ljk->lik', fixed_rot, rot_j,
                       precision='highest')
    pris = (jtype == PRISMATIC).astype(dtype)[:, None]
    j_trans = fixed_trans + pris * jnp.einsum(
        'lij,lj->li', fixed_rot, axis * theta[:, None],
        precision='highest')

    def step(carry, i):
        rots, trans = carry
        p = parent[i]
        pc = jnp.maximum(p, 0)
        Rp = jnp.where(p < 0, jnp.eye(3, dtype=dtype), rots[pc])
        tp = jnp.where(p < 0, jnp.zeros(3, dtype), trans[pc])
        w_rot = matmul_f32(Rp, j_rot[i])
        w_tr = tp + matmul_f32(Rp, j_trans[i])
        rots = rots.at[i].set(w_rot)
        trans = trans.at[i].set(w_tr)
        return (rots, trans), None

    init = (jnp.zeros((L, 3, 3), dtype), jnp.zeros((L, 3), dtype))
    (rot, tr), _ = jax.lax.scan(step, init, jnp.arange(L))
    if base_rot is not None:
        tr = jnp.einsum('ij,lj->li', base_rot, tr,
                        precision='highest') + base_trans
        rot = jnp.einsum('ij,ljk->lik', base_rot, rot, precision='highest')
    return rot, tr


def fk_selected_positions(spec: ChainSpec, q: jnp.ndarray,
                          link_indices: Sequence[int],
                          base_rot: Optional[jnp.ndarray] = None,
                          base_trans: Optional[jnp.ndarray] = None
                          ) -> jnp.ndarray:
    """FK returning only selected links' positions: [len(sel), 3]."""
    rot, tr = fk_link_poses(spec, q, base_rot, base_trans)
    return tr[jnp.asarray(list(link_indices))]


def fk_collision_pieces(spec: ChainSpec, q: jnp.ndarray,
                        base_rot: Optional[jnp.ndarray] = None,
                        base_trans: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World poses of every collision piece: (rot [P,3,3], trans [P,3]).

    Pieces are the concatenation over links of their collision-origin
    transforms (ref: rigid_body.py:129-130 composes link pose with each
    collision origin).
    """
    rot, tr = fk_link_poses(spec, q, base_rot, base_trans)
    piece_rots, piece_trans = [], []
    for li, origins in enumerate(spec.collision_origins):
        for origin in origins:
            o = np.asarray(origin)
            o_rot = jnp.asarray(o[:3, :3], dtype=tr.dtype)
            o_tr = jnp.asarray(o[:3, 3], dtype=tr.dtype)
            piece_rots.append(matmul_f32(rot[li], o_rot))
            piece_trans.append(tr[li] + matmul_f32(rot[li], o_tr))
    if not piece_rots:
        return jnp.zeros((0, 3, 3), tr.dtype), jnp.zeros((0, 3), tr.dtype)
    return jnp.stack(piece_rots), jnp.stack(piece_trans)


def chain_from_joint_list(joints: List[dict], root_name: str = 'base',
                          joint_limits: Optional[np.ndarray] = None
                          ) -> ChainSpec:
    """Build a ChainSpec from a list of joint dicts (host-side, build time).

    Each dict: {name, parent, child, type, axis, origin_rot (3x3),
    origin_trans (3,), limits (lo, hi) or None, mimic (src_joint, mult,
    offset) or None, collision_origins: [4x4, ...]}.
    """
    link_names: List[str] = [root_name]
    link_parent: Dict[str, str] = {}
    by_child = {}
    children: Dict[str, List[str]] = {root_name: []}
    for j in joints:
        by_child[j['child']] = j
        children.setdefault(j['parent'], []).append(j['child'])
        children.setdefault(j['child'], [])
    # topological order (DFS from root)
    order: List[str] = []
    stack = [root_name]
    while stack:
        n = stack.pop()
        order.append(n)
        stack.extend(reversed(children.get(n, [])))
    name_to_idx = {n: i for i, n in enumerate(order)}

    L = len(order)
    parent = np.full(L, -1, np.int32)
    jtype = np.zeros(L, np.int32)
    axis = np.zeros((L, 3), np.float32)
    axis[:, 2] = 1.0
    fixed_rot = np.tile(np.eye(3, dtype=np.float32), (L, 1, 1))
    fixed_trans = np.zeros((L, 3), np.float32)
    dof_idx = np.full(L, -1, np.int32)
    mimic_mult = np.ones(L, np.float32)
    mimic_offset = np.zeros(L, np.float32)
    collision_origins: List[Tuple[np.ndarray, ...]] = [() for _ in range(L)]
    joint_names: List[str] = [''] * L

    tmap = {'fixed': FIXED, 'revolute': REVOLUTE, 'continuous': REVOLUTE,
            'prismatic': PRISMATIC}
    unsupported = [j['name'] for j in joints if j['type'] not in tmap]
    if unsupported:
        # 'floating' (6 dof) / 'planar' (3 dof) must not silently weld the
        # child in place — that produces plausible-looking wrong FK
        raise ValueError(
            f'unsupported URDF joint type(s) on {unsupported}: only '
            f'fixed/revolute/continuous/prismatic (+ mimic) are modeled; '
            f'decompose floating/planar joints into single-dof joints')
    n_dofs = 0
    limits: List[Tuple[float, float]] = []
    joint_dof: Dict[str, int] = {}
    # first pass: assign dofs to non-mimic movable joints in order
    for n in order[1:]:
        j = by_child[n]
        if tmap[j['type']] != FIXED and j.get('mimic') is None:
            joint_dof[j['name']] = n_dofs
            n_dofs += 1
            lo, hi = j.get('limits') or (-np.pi, np.pi)
            if j['type'] == 'continuous':
                lo, hi = -2 * np.pi, 2 * np.pi
            limits.append((lo, hi))
    mimic_by_name = {jj['name']: jj for jj in joints}
    for n in order[1:]:
        j = by_child[n]
        i = name_to_idx[n]
        parent[i] = name_to_idx[j['parent']]
        jtype[i] = tmap[j['type']]
        joint_names[i] = j['name']
        if j.get('axis') is not None:
            a = np.asarray(j['axis'], np.float32)
            nrm = np.linalg.norm(a)
            axis[i] = a / nrm if nrm > 0 else np.array([0, 0, 1], np.float32)
        fixed_rot[i] = np.asarray(j['origin_rot'], np.float32)
        fixed_trans[i] = np.asarray(j['origin_trans'], np.float32)
        if jtype[i] != FIXED:
            if j.get('mimic') is not None:
                # resolve mimic CHAINS transitively (C mimics B mimics A
                # => q_C = m_C * (m_B * q_A + o_B) + o_C), with cycle and
                # dangling-source detection — URDFs in the wild do chain
                # mimics, and a raw dict lookup would KeyError on them
                src, mult, off = j['mimic']
                seen = {j['name']}
                while src not in joint_dof:
                    if src in seen:
                        raise ValueError(
                            f'mimic cycle involving joint {src!r}')
                    seen.add(src)
                    src_j = mimic_by_name.get(src)
                    if src_j is None:
                        raise ValueError(
                            f'joint {j["name"]!r} mimics unknown joint '
                            f'{src!r}')
                    if src_j.get('mimic') is None:
                        raise ValueError(
                            f'joint {j["name"]!r} mimics {src!r} which '
                            f'owns no dof (fixed joint?)')
                    s2, m2, o2 = src_j['mimic']
                    # fold the source's mimic into ours
                    off = mult * o2 + off
                    mult = mult * m2
                    src = s2
                dof_idx[i] = joint_dof[src]
                mimic_mult[i] = mult
                mimic_offset[i] = off
            else:
                dof_idx[i] = joint_dof[j['name']]
        collision_origins[i] = tuple(
            np.asarray(c, np.float32) for c in j.get('collision_origins', ()))
    if joint_limits is None:
        joint_limits = np.asarray(limits, np.float32).reshape(n_dofs, 2)
    return ChainSpec(
        link_names=tuple(order), parent=parent, jtype=jtype, axis=axis,
        fixed_rot=fixed_rot, fixed_trans=fixed_trans, dof_idx=dof_idx,
        mimic_mult=mimic_mult, mimic_offset=mimic_offset,
        joint_limits=np.asarray(joint_limits, np.float32),
        joint_names=tuple(joint_names),
        collision_origins=tuple(collision_origins))

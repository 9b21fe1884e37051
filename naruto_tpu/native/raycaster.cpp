// Triangle-mesh RGB-D + equirectangular raycaster - C++ core.
//
// Role parity: habitat-sim's C++ renderer in the reference (SURVEY.md C5/2.8
// - pinhole RGB-D and ERP RGB-distance from scene meshes, agent pose as
// camera-to-world). This implementation raycasts a BVH (median-split AABB
// tree, Moller-Trumbore intersection) instead of rasterizing with OpenGL;
// per-vertex colors are barycentrically interpolated. OpenMP parallel over
// pixels.
//
// Conventions: poses arrive as RDF (OpenCV) camera-to-world, row-major 4x4.
// Pinhole depth output is z-depth (habitat depth sensor convention); ERP
// output is radial distance with misses set to `invalid_value`
// (habitat_simulator.py:142 semantics).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct V3 {
    float x, y, z;
};
inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 operator*(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(V3 a, V3 b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}
inline V3 vmin(V3 a, V3 b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline V3 vmax(V3 a, V3 b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct BVHNode {
    V3 bmin, bmax;
    int left = -1, right = -1;   // children, or
    int start = 0, count = 0;    // leaf triangle range
};

struct Hit {
    float t = 1e30f;
    int tri = -1;
    float u = 0, v = 0;
};

struct Mesh {
    std::vector<V3> verts;
    std::vector<V3> colors;   // empty if none
    std::vector<int> tris;    // 3*n
    std::vector<int> order;   // triangle permutation for BVH leaves
    std::vector<BVHNode> nodes;

    V3 tri_centroid(int t) const {
        V3 a = verts[tris[3 * t]], b = verts[tris[3 * t + 1]],
           c = verts[tris[3 * t + 2]];
        return (a + b + c) * (1.0f / 3.0f);
    }

    void build() {
        int n = (int)tris.size() / 3;
        order.resize(n);
        for (int i = 0; i < n; i++) order[i] = i;
        nodes.reserve(2 * n);
        build_node(0, n);
    }

    int build_node(int start, int count) {
        int idx = (int)nodes.size();
        nodes.push_back({});
        V3 bmin = {1e30f, 1e30f, 1e30f}, bmax = {-1e30f, -1e30f, -1e30f};
        for (int i = start; i < start + count; i++) {
            int t = order[i];
            for (int k = 0; k < 3; k++) {
                V3 p = verts[tris[3 * t + k]];
                bmin = vmin(bmin, p);
                bmax = vmax(bmax, p);
            }
        }
        nodes[idx].bmin = bmin;
        nodes[idx].bmax = bmax;
        if (count <= 4) {
            nodes[idx].start = start;
            nodes[idx].count = count;
            return idx;
        }
        V3 ext = bmax - bmin;
        int axis = 0;
        if (ext.y > ext.x) axis = 1;
        if (ext.z > (axis == 0 ? ext.x : ext.y)) axis = 2;
        int mid = start + count / 2;
        std::nth_element(
            order.begin() + start, order.begin() + mid,
            order.begin() + start + count, [&](int a, int b) {
                V3 ca = tri_centroid(a), cb = tri_centroid(b);
                float va = axis == 0 ? ca.x : (axis == 1 ? ca.y : ca.z);
                float vb = axis == 0 ? cb.x : (axis == 1 ? cb.y : cb.z);
                return va < vb;
            });
        int l = build_node(start, count / 2);
        int r = build_node(mid, count - count / 2);
        nodes[idx].left = l;
        nodes[idx].right = r;
        nodes[idx].count = 0;
        return idx;
    }

    static bool aabb_hit(V3 bmin, V3 bmax, V3 o, V3 inv_d, float tmax) {
        float t1 = (bmin.x - o.x) * inv_d.x, t2 = (bmax.x - o.x) * inv_d.x;
        float tlo = std::min(t1, t2), thi = std::max(t1, t2);
        t1 = (bmin.y - o.y) * inv_d.y;
        t2 = (bmax.y - o.y) * inv_d.y;
        tlo = std::max(tlo, std::min(t1, t2));
        thi = std::min(thi, std::max(t1, t2));
        t1 = (bmin.z - o.z) * inv_d.z;
        t2 = (bmax.z - o.z) * inv_d.z;
        tlo = std::max(tlo, std::min(t1, t2));
        thi = std::min(thi, std::max(t1, t2));
        return thi >= std::max(tlo, 0.0f) && tlo < tmax;
    }

    void intersect_tri(int t, V3 o, V3 d, Hit& h) const {
        V3 a = verts[tris[3 * t]];
        V3 e1 = verts[tris[3 * t + 1]] - a;
        V3 e2 = verts[tris[3 * t + 2]] - a;
        V3 p = cross(d, e2);
        float det = dot(e1, p);
        if (std::fabs(det) < 1e-12f) return;
        float inv = 1.0f / det;
        V3 s = o - a;
        // small barycentric tolerance: rays crossing exactly on a shared
        // edge/diagonal must not fall through the crack between the two
        // adjacent triangles (watertightness)
        const float EPS = 1e-6f;
        float u = dot(s, p) * inv;
        if (u < -EPS || u > 1.0f + EPS) return;
        V3 q = cross(s, e1);
        float v = dot(d, q) * inv;
        if (v < -EPS || u + v > 1.0f + EPS) return;
        float t_hit = dot(e2, q) * inv;
        if (t_hit > 1e-5f && t_hit < h.t) {
            h.t = t_hit;
            h.tri = t;
            h.u = u;
            h.v = v;
        }
    }

    Hit trace(V3 o, V3 d) const {
        Hit h;
        V3 inv_d = {1.0f / (std::fabs(d.x) > 1e-12f ? d.x : 1e-12f),
                    1.0f / (std::fabs(d.y) > 1e-12f ? d.y : 1e-12f),
                    1.0f / (std::fabs(d.z) > 1e-12f ? d.z : 1e-12f)};
        int stack[64];
        int sp = 0;
        stack[sp++] = 0;
        while (sp) {
            const BVHNode& n = nodes[stack[--sp]];
            if (!aabb_hit(n.bmin, n.bmax, o, inv_d, h.t)) continue;
            if (n.left < 0) {
                for (int i = n.start; i < n.start + n.count; i++)
                    intersect_tri(order[i], o, d, h);
            } else {
                if (sp < 62) {
                    stack[sp++] = n.left;
                    stack[sp++] = n.right;
                }
            }
        }
        return h;
    }

    V3 shade(const Hit& h) const {
        if (h.tri < 0) return {0, 0, 0};
        int i0 = tris[3 * h.tri], i1 = tris[3 * h.tri + 1],
            i2 = tris[3 * h.tri + 2];
        if (!colors.empty()) {
            V3 c = colors[i0] * (1 - h.u - h.v) + colors[i1] * h.u
                   + colors[i2] * h.v;
            return c;
        }
        // no vertex colors: shade by |normal| as a stable gray-ish albedo
        V3 n = cross(verts[i1] - verts[i0], verts[i2] - verts[i0]);
        float len = std::sqrt(dot(n, n));
        if (len > 0) n = n * (1.0f / len);
        return {0.5f + 0.5f * std::fabs(n.x), 0.5f + 0.5f * std::fabs(n.y),
                0.5f + 0.5f * std::fabs(n.z)};
    }
};

// Dynamic rigid object: mesh in object-local coordinates + a rigid world
// pose. Rays are transformed into object space (two-level BVH without
// refitting) - parity with the reference's habitat rigid-object manager
// (habitat_utils.py:342-426; poses advanced host-side by the Python layer's
// step_physics, matching habitat's step_physics call sites).
struct Object {
    Mesh mesh;
    // world->object rigid transform, row-major 3x4
    float w2o[12] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0};

    V3 to_obj_point(V3 p) const {
        return {w2o[0] * p.x + w2o[1] * p.y + w2o[2] * p.z + w2o[3],
                w2o[4] * p.x + w2o[5] * p.y + w2o[6] * p.z + w2o[7],
                w2o[8] * p.x + w2o[9] * p.y + w2o[10] * p.z + w2o[11]};
    }
    V3 to_obj_dir(V3 d) const {
        return {w2o[0] * d.x + w2o[1] * d.y + w2o[2] * d.z,
                w2o[4] * d.x + w2o[5] * d.y + w2o[6] * d.z,
                w2o[8] * d.x + w2o[9] * d.y + w2o[10] * d.z};
    }
};

struct Scene {
    Mesh base;
    std::vector<Object*> objs;
    ~Scene() {
        for (Object* o : objs) delete o;
    }

    // trace static mesh + all objects; returns the winning mesh for shading
    const Mesh* trace_all(V3 o, V3 d, Hit& best) const {
        best = base.trace(o, d);
        const Mesh* mesh = &base;
        for (const Object* obj : objs) {
            Hit h = obj->mesh.trace(obj->to_obj_point(o), obj->to_obj_dir(d));
            if (h.tri >= 0 && h.t < best.t) {
                best = h;
                mesh = &obj->mesh;
            }
        }
        if (best.tri < 0) mesh = nullptr;
        return mesh;
    }
};

}  // namespace

extern "C" {

void* rc_create(const float* verts, int n_verts, const float* colors,
                const int* tris, int n_tris) {
    Scene* s = new Scene();
    Mesh* m = &s->base;
    m->verts.resize(n_verts);
    memcpy(m->verts.data(), verts, sizeof(float) * 3 * n_verts);
    if (colors) {
        m->colors.resize(n_verts);
        memcpy(m->colors.data(), colors, sizeof(float) * 3 * n_verts);
    }
    m->tris.assign(tris, tris + 3 * n_tris);
    m->build();
    return s;
}

void rc_destroy(void* h) { delete (Scene*)h; }

// add a rigid object (object-local vertices); returns its id
int rc_add_object(void* h, const float* verts, int n_verts,
                  const float* colors, const int* tris, int n_tris) {
    Scene* s = (Scene*)h;
    Object* obj = new Object();
    obj->mesh.verts.resize(n_verts);
    memcpy(obj->mesh.verts.data(), verts, sizeof(float) * 3 * n_verts);
    if (colors) {
        obj->mesh.colors.resize(n_verts);
        memcpy(obj->mesh.colors.data(), colors, sizeof(float) * 3 * n_verts);
    }
    obj->mesh.tris.assign(tris, tris + 3 * n_tris);
    obj->mesh.build();
    s->objs.push_back(obj);
    return (int)s->objs.size() - 1;
}

// set an object's rigid object->world pose (row-major 4x4); the inverse is
// stored for ray transformation
void rc_set_object_pose(void* h, int obj_id, const float* o2w) {
    Scene* s = (Scene*)h;
    if (obj_id < 0 || obj_id >= (int)s->objs.size()) return;
    Object* obj = s->objs[obj_id];
    // inverse of rigid [R|t]: [R^T | -R^T t]
    float r[9] = {o2w[0], o2w[1], o2w[2], o2w[4], o2w[5],
                  o2w[6], o2w[8], o2w[9], o2w[10]};
    float t[3] = {o2w[3], o2w[7], o2w[11]};
    // R^T rows
    obj->w2o[0] = r[0];
    obj->w2o[1] = r[3];
    obj->w2o[2] = r[6];
    obj->w2o[4] = r[1];
    obj->w2o[5] = r[4];
    obj->w2o[6] = r[7];
    obj->w2o[8] = r[2];
    obj->w2o[9] = r[5];
    obj->w2o[10] = r[8];
    obj->w2o[3] = -(obj->w2o[0] * t[0] + obj->w2o[1] * t[1]
                    + obj->w2o[2] * t[2]);
    obj->w2o[7] = -(obj->w2o[4] * t[0] + obj->w2o[5] * t[1]
                    + obj->w2o[6] * t[2]);
    obj->w2o[11] = -(obj->w2o[8] * t[0] + obj->w2o[9] * t[1]
                     + obj->w2o[10] * t[2]);
}

// c2w: row-major 4x4, RDF camera-to-world
void rc_render_pinhole(void* h, const float* c2w, int H, int W, float fx,
                       float fy, float cx, float cy, float* out_color,
                       float* out_depth) {
    const Scene* m = (const Scene*)h;
    V3 o = {c2w[3], c2w[7], c2w[11]};
    V3 r0 = {c2w[0], c2w[4], c2w[8]};
    V3 r1 = {c2w[1], c2w[5], c2w[9]};
    V3 r2 = {c2w[2], c2w[6], c2w[10]};
#pragma omp parallel for schedule(dynamic, 8)
    for (int v = 0; v < H; v++) {
        for (int u = 0; u < W; u++) {
            float dx = (u - cx) / fx, dy = (v - cy) / fy;
            V3 d_cam = {dx, dy, 1.0f};
            float nrm = std::sqrt(dot(d_cam, d_cam));
            V3 d = r0 * (dx / nrm) + r1 * (dy / nrm) + r2 * (1.0f / nrm);
            Hit hit;
            const Mesh* hm = m->trace_all(o, d, hit);
            int idx = v * W + u;
            if (hm) {
                V3 c = hm->shade(hit);
                out_color[3 * idx] = c.x;
                out_color[3 * idx + 1] = c.y;
                out_color[3 * idx + 2] = c.z;
                out_depth[idx] = hit.t / nrm;  // radial -> z-depth
            } else {
                out_color[3 * idx] = out_color[3 * idx + 1] =
                    out_color[3 * idx + 2] = 0.0f;
                out_depth[idx] = 0.0f;
            }
        }
    }
}

void rc_render_erp(void* h, const float* c2w, int H, int W,
                   float invalid_value, float* out_color, float* out_dist) {
    const Scene* m = (const Scene*)h;
    V3 o = {c2w[3], c2w[7], c2w[11]};
    V3 r0 = {c2w[0], c2w[4], c2w[8]};
    V3 r1 = {c2w[1], c2w[5], c2w[9]};
    V3 r2 = {c2w[2], c2w[6], c2w[10]};
    const float PI = 3.14159265358979f;
#pragma omp parallel for schedule(dynamic, 4)
    for (int v = 0; v < H; v++) {
        float theta = PI * (0.5f - (v + 0.5f) / H);
        float ct = std::cos(theta), st = std::sin(theta);
        for (int u = 0; u < W; u++) {
            float phi = 2 * PI * ((u + 0.5f) / W - 0.5f);
            // RDF: x right, y down, z forward
            V3 d_cam = {ct * std::sin(phi), -st, ct * std::cos(phi)};
            V3 d = r0 * d_cam.x + r1 * d_cam.y + r2 * d_cam.z;
            Hit hit;
            const Mesh* hm = m->trace_all(o, d, hit);
            int idx = v * W + u;
            if (hm) {
                V3 c = hm->shade(hit);
                out_color[3 * idx] = c.x;
                out_color[3 * idx + 1] = c.y;
                out_color[3 * idx + 2] = c.z;
                out_dist[idx] = hit.t;
            } else {
                out_color[3 * idx] = out_color[3 * idx + 1] =
                    out_color[3 * idx + 2] = 0.0f;
                out_dist[idx] = invalid_value;
            }
        }
    }
}

}  // extern "C"

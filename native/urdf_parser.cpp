// Native URDF -> flat skeleton parser.
//
// The reference consumes URDFs through Bullet's C++ loader (via the pybullet
// wheel, reference bullet_agent.py:65-69). This is our equivalent: a small,
// dependency-free C++ parser that flattens a URDF into the arrays the JAX FK
// core consumes (parents, joint origins, inertial origins, masses). Exposed
// through a C ABI and loaded from Python with ctypes
// (tip_tpu/utils/urdf.py::_parse_native).
//
// Scope: the subset of URDF the kinematic pipeline uses — <link><inertial>
// (origin xyz, mass) and <joint> (type, origin xyz/rpy, parent, child).
// Joint order = file order, matching PyBullet's URDF_MAINTAIN_LINK_ORDER.

#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Vec3 {
  double x = 0, y = 0, z = 0;
};

struct LinkInfo {
  Vec3 com;
  double mass = 0;
};

struct JointInfo {
  std::string name;
  std::string parent;
  std::string child;
  Vec3 origin;
  Vec3 rpy;
  bool fixed = false;
};

// Minimal forgiving XML scanner: walks tags in order, tracking only the
// element kinds the URDF subset needs. Not a general XML parser (no CDATA,
// comments are skipped, attribute values must be quoted) — sufficient for
// robot description files.
class XmlScanner {
 public:
  explicit XmlScanner(std::string text) : text_(std::move(text)) {}

  // Returns false at end of input. On success fills `tag` (lowercase name,
  // with leading '/' for closing tags) and `attrs`.
  bool Next(std::string* tag, std::map<std::string, std::string>* attrs) {
    while (true) {
      size_t lt = text_.find('<', pos_);
      if (lt == std::string::npos) return false;
      // skip comments and declarations
      if (text_.compare(lt, 4, "<!--") == 0) {
        size_t end = text_.find("-->", lt);
        pos_ = (end == std::string::npos) ? text_.size() : end + 3;
        continue;
      }
      if (text_[lt + 1] == '?') {
        size_t end = text_.find('>', lt);
        pos_ = (end == std::string::npos) ? text_.size() : end + 1;
        continue;
      }
      size_t gt = text_.find('>', lt);
      if (gt == std::string::npos) return false;
      std::string inner = text_.substr(lt + 1, gt - lt - 1);
      pos_ = gt + 1;
      bool self_close = !inner.empty() && inner.back() == '/';
      if (self_close) inner.pop_back();

      std::istringstream ss(inner);
      std::string name;
      ss >> name;
      attrs->clear();
      std::string rest;
      std::getline(ss, rest);
      ParseAttrs(rest, attrs);
      *tag = name;
      self_closed_ = self_close;
      return true;
    }
  }

  bool self_closed() const { return self_closed_; }

 private:
  static void ParseAttrs(const std::string& s,
                         std::map<std::string, std::string>* attrs) {
    size_t i = 0;
    while (i < s.size()) {
      while (i < s.size() && (isspace(s[i]) != 0)) i++;
      size_t eq = s.find('=', i);
      if (eq == std::string::npos) break;
      std::string key = s.substr(i, eq - i);
      // trim
      while (!key.empty() && isspace(key.back())) key.pop_back();
      size_t q1 = s.find('"', eq);
      if (q1 == std::string::npos) break;
      size_t q2 = s.find('"', q1 + 1);
      if (q2 == std::string::npos) break;
      (*attrs)[key] = s.substr(q1 + 1, q2 - q1 - 1);
      i = q2 + 1;
    }
  }

  std::string text_;
  size_t pos_ = 0;
  bool self_closed_ = false;
};

Vec3 ParseVec3(const std::string& s) {
  Vec3 v;
  std::istringstream ss(s);
  ss >> v.x >> v.y >> v.z;
  return v;
}

}  // namespace

extern "C" {

// Parses `path`. Writes up to `max_joints` joints. Returns the number of
// joints on success, or a negative error code.
//  parent:       int[max_joints]
//  joint_offset: double[max_joints*3]
//  joint_rpy:    double[max_joints*3]
//  is_fixed:     int[max_joints]
//  com_offset:   double[(max_joints+1)*3]  (root link first)
//  link_mass:    double[max_joints+1]
//  names_out:    ';'-joined joint names, NUL-terminated
int tip_urdf_parse(const char* path, int max_joints, int* parent,
                   double* joint_offset, double* joint_rpy, int* is_fixed,
                   double* com_offset, double* link_mass, char* names_out,
                   int names_cap) {
  std::ifstream f(path);
  if (!f) return -1;
  std::stringstream buf;
  buf << f.rdbuf();
  XmlScanner scanner(buf.str());

  std::map<std::string, LinkInfo> links;
  std::vector<std::string> link_order;
  std::vector<JointInfo> joints;

  std::string tag;
  std::map<std::string, std::string> attrs;
  enum Ctx { NONE, LINK, LINK_INERTIAL, JOINT } ctx = NONE;
  std::string cur_link;
  JointInfo cur_joint;
  // non-kinematic URDF blocks whose children (including <joint> tags with
  // transmission semantics) must not be mistaken for kinematic elements
  int skip_depth = 0;
  std::string skip_tag;

  while (scanner.Next(&tag, &attrs)) {
    if (skip_depth > 0) {
      if (tag == skip_tag && !scanner.self_closed()) skip_depth++;
      else if (tag == "/" + skip_tag) skip_depth--;
      continue;
    }
    if (tag == "transmission" || tag == "gazebo" || tag == "sensor") {
      if (!scanner.self_closed()) {
        skip_depth = 1;
        skip_tag = tag;
      }
      continue;
    }
    if (tag == "link") {
      ctx = LINK;
      cur_link = attrs["name"];
      links.emplace(cur_link, LinkInfo{});
      link_order.push_back(cur_link);
    } else if (tag == "/link") {
      ctx = NONE;
    } else if (tag == "inertial" && ctx == LINK) {
      ctx = LINK_INERTIAL;
    } else if (tag == "/inertial" && ctx == LINK_INERTIAL) {
      ctx = LINK;
    } else if (tag == "origin" && ctx == LINK_INERTIAL) {
      if (attrs.count("xyz")) links[cur_link].com = ParseVec3(attrs["xyz"]);
    } else if (tag == "mass" && ctx == LINK_INERTIAL) {
      if (attrs.count("value")) links[cur_link].mass = atof(attrs["value"].c_str());
    } else if (tag == "joint") {
      cur_joint = JointInfo{};
      cur_joint.name = attrs["name"];
      cur_joint.fixed = attrs["type"] == "fixed";
      if (scanner.self_closed()) {
        // degenerate <joint .../> — record it (it will fail link checks
        // below) without leaving ctx stuck at JOINT
        joints.push_back(cur_joint);
        ctx = NONE;
      } else {
        ctx = JOINT;
      }
    } else if (tag == "/joint") {
      if (ctx == JOINT) joints.push_back(cur_joint);
      ctx = NONE;
    } else if (ctx == JOINT && tag == "origin") {
      if (attrs.count("xyz")) cur_joint.origin = ParseVec3(attrs["xyz"]);
      if (attrs.count("rpy")) cur_joint.rpy = ParseVec3(attrs["rpy"]);
    } else if (ctx == JOINT && tag == "parent") {
      cur_joint.parent = attrs["link"];
    } else if (ctx == JOINT && tag == "child") {
      cur_joint.child = attrs["link"];
    }
  }

  int n = static_cast<int>(joints.size());
  if (n == 0 || n > max_joints || link_order.empty()) return -2;

  // every joint must reference declared links — a typo'd <child link=...>
  // must be a parse error, not a silently default-constructed link
  for (int j = 0; j < n; j++) {
    if (joints[j].child.empty() || links.count(joints[j].child) == 0 ||
        joints[j].parent.empty() || links.count(joints[j].parent) == 0) {
      return -5;  // joint references an undeclared link
    }
  }

  const std::string& root = link_order.front();
  std::map<std::string, int> child_to_idx;
  for (int j = 0; j < n; j++) child_to_idx[joints[j].child] = j;

  std::string names;
  for (int j = 0; j < n; j++) {
    const JointInfo& ji = joints[j];
    parent[j] = (ji.parent == root) ? -1
                                    : (child_to_idx.count(ji.parent)
                                           ? child_to_idx[ji.parent]
                                           : -2);
    if (parent[j] == -2) return -3;  // parent link has no joint (unsupported)
    joint_offset[j * 3 + 0] = ji.origin.x;
    joint_offset[j * 3 + 1] = ji.origin.y;
    joint_offset[j * 3 + 2] = ji.origin.z;
    joint_rpy[j * 3 + 0] = ji.rpy.x;
    joint_rpy[j * 3 + 1] = ji.rpy.y;
    joint_rpy[j * 3 + 2] = ji.rpy.z;
    is_fixed[j] = ji.fixed ? 1 : 0;
    if (j) names += ';';
    names += ji.name;
  }

  const LinkInfo& rl = links[root];
  com_offset[0] = rl.com.x;
  com_offset[1] = rl.com.y;
  com_offset[2] = rl.com.z;
  link_mass[0] = rl.mass;
  for (int j = 0; j < n; j++) {
    const LinkInfo& li = links[joints[j].child];
    com_offset[(j + 1) * 3 + 0] = li.com.x;
    com_offset[(j + 1) * 3 + 1] = li.com.y;
    com_offset[(j + 1) * 3 + 2] = li.com.z;
    link_mass[j + 1] = li.mass;
  }

  if (static_cast<int>(names.size()) + 1 > names_cap) return -4;
  std::memcpy(names_out, names.c_str(), names.size() + 1);
  return n;
}

}  // extern "C"
